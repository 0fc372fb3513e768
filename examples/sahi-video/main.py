"""SAHI-style sliced inference over a video.

Mirrors the reference example (examples/YOLOv8-SAHI-Inference-Video/
yolov8_sahi.py:1-111): tile each frame with overlap, detect per tile, merge
tile detections back to frame coordinates with class-wise NMS — small
objects that vanish at full-frame scale survive at tile scale. Here all
tiles of a frame run as ONE batched XLA program
(`solutions/sliced_inference.py`).

Usage:
    python main.py model.yaml video.mp4 [tile] [overlap]
"""

from __future__ import annotations

import sys

import cv2
import numpy as np

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.solutions.sliced_inference import sliced_predict


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "yolov10n.yaml"
    source = sys.argv[2]
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 320
    overlap = float(sys.argv[4]) if len(sys.argv) > 4 else 0.2

    model = YOLO(model_name)
    cap = cv2.VideoCapture(source)
    writer = None
    n_frames, n_dets = 0, 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        dets = sliced_predict(model, frame, tile=tile, overlap=overlap)  # (N, 6)
        n_frames += 1
        n_dets += len(dets)
        for x1, y1, x2, y2, conf, cls in np.asarray(dets):
            cv2.rectangle(frame, (int(x1), int(y1)), (int(x2), int(y2)), (56, 56, 255), 2)
            cv2.putText(frame, f"{int(cls)}: {conf:.2f}", (int(x1), max(int(y1) - 4, 12)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (56, 56, 255), 1)
        if writer is None:
            h, w = frame.shape[:2]
            writer = cv2.VideoWriter("sliced_out.avi", cv2.VideoWriter_fourcc(*"MJPG"),
                                     cap.get(cv2.CAP_PROP_FPS) or 30, (w, h))
        writer.write(frame)
    cap.release()
    if writer is not None:
        writer.release()
    print(f"{n_frames} frames, {n_dets} detections -> sliced_out.avi")


if __name__ == "__main__":
    main()
