"""FLOPs/params report for the flagship models (analog of reference flops.py).

Usage: python flops.py [model.yaml] [imgsz]
"""

import sys

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.utils.profilers import model_cost, n_params


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "yolov10n.yaml"
    imgsz = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    m = YOLO(name)
    cost = model_cost(m.model, m.variables, imgsz=imgsz)
    print(f"{name}: {n_params(m.variables) / 1e6:.2f} M params, "
          f"{cost['gflops/img']:.1f} GFLOPs @ {imgsz}x{imgsz}")


if __name__ == "__main__":
    main()
