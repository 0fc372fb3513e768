"""TFLite client for the exported (int8-quantized) model — no framework
imports.

Mirrors the reference example (examples/YOLOv8-OpenCV-int8-tflite-Python/
main.py:1-299): drive the TFLite interpreter directly, handling quantized
input/output tensors via their (scale, zero_point) params when the converter
produced int8 IO, and float IO otherwise.

The artifact contract (engine/exporter.py): input NHWC [B,H,W,3] in [0,1];
output (B, max_det, 6) rows [x1, y1, x2, y2, conf, cls] in letterboxed
pixels (the NMS-free decode is inside the graph — no client-side NMS).

Usage:
    python main.py model_int8.tflite image.jpg [conf]
"""

from __future__ import annotations

import sys

import cv2
import numpy as np


def letterbox(img: np.ndarray, size: int):
    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = round(h * r), round(w * r)
    canvas = np.full((size, size, 3), 114, np.uint8)
    top, left = (size - nh) // 2, (size - nw) // 2
    canvas[top : top + nh, left : left + nw] = cv2.resize(img, (nw, nh))
    return canvas, r, (left, top)


def run_tflite(model_path: str, image_bgr: np.ndarray, conf: float = 0.25) -> list[dict]:
    """BGR image -> [{'box', 'conf', 'cls'}] in original-image pixels."""
    try:
        from tflite_runtime.interpreter import Interpreter  # lightweight deploy pkg
    except ImportError:
        from tensorflow.lite.python.interpreter import Interpreter

    interp = Interpreter(model_path=model_path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    size = inp["shape"][1]

    padded, r, (left, top) = letterbox(image_bgr, size)
    x = padded[..., ::-1][None].astype(np.float32) / 255.0  # RGB NHWC [0,1]

    if inp["dtype"] == np.int8 or inp["dtype"] == np.uint8:
        scale, zp = inp["quantization"]
        x = np.clip(np.round(x / scale + zp), np.iinfo(inp["dtype"]).min,
                    np.iinfo(inp["dtype"]).max).astype(inp["dtype"])
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    det = interp.get_tensor(out["index"])
    if out["dtype"] == np.int8 or out["dtype"] == np.uint8:
        scale, zp = out["quantization"]
        det = (det.astype(np.float32) - zp) * scale
    det = det[0]  # (max_det, 6): x1,y1,x2,y2,conf,cls

    det = det[det[:, 4] >= conf]
    boxes = det[:, :4].copy()
    boxes[:, [0, 2]] = (boxes[:, [0, 2]] - left) / r
    boxes[:, [1, 3]] = (boxes[:, [1, 3]] - top) / r
    h, w = image_bgr.shape[:2]
    boxes = np.clip(boxes, 0, [w, h, w, h])
    return [
        {"box": b.tolist(), "conf": float(d[4]), "cls": int(d[5])}
        for b, d in zip(boxes, det)
    ]


def main():
    model_path, img_path = sys.argv[1], sys.argv[2]
    conf = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    image = cv2.imread(img_path)
    dets = run_tflite(model_path, image, conf)
    for d in dets:
        x1, y1, x2, y2 = (int(v) for v in d["box"])
        cv2.rectangle(image, (x1, y1), (x2, y2), (0, 255, 0), 2)
    cv2.imwrite("detections.jpg", image)
    print(f"{len(dets)} detections -> detections.jpg")


if __name__ == "__main__":
    main()
