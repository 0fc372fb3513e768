"""OpenCV-DNN client for the exported ONNX model — no framework imports.

Mirrors the reference example client (examples/YOLOv8-OpenCV-ONNX-Python/
main.py:1-130): load `.onnx` with cv2.dnn, square-letterbox, forward, then
class-argmax + NMS in numpy on the raw prediction head.

The artifact contract (engine/exporter.py ONNX branch): input fp32 NCHW in
[0,1]; output `pred` is (B, anchors, 4+nc) with xyxy boxes in letterboxed
pixels and sigmoid class scores.

Usage:
    python main.py model.onnx image.jpg [conf] [iou]
"""

from __future__ import annotations

import sys

import cv2
import numpy as np


def letterbox(img: np.ndarray, size: int) -> tuple[np.ndarray, float, tuple[int, int]]:
    """Aspect-preserving resize onto a gray size x size canvas (top-left pad
    offsets returned so detections can be mapped back)."""
    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = round(h * r), round(w * r)
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.full((size, size, 3), 114, np.uint8)
    top, left = (size - nh) // 2, (size - nw) // 2
    canvas[top : top + nh, left : left + nw] = resized
    return canvas, r, (left, top)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> list[int]:
    """Plain numpy greedy NMS over xyxy boxes."""
    order = scores.argsort()[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = boxes[order[1:]]
        xy1 = np.maximum(boxes[i, :2], rest[:, :2])
        xy2 = np.minimum(boxes[i, 2:], rest[:, 2:])
        inter = np.prod(np.clip(xy2 - xy1, 0, None), axis=1)
        area_i = np.prod(boxes[i, 2:] - boxes[i, :2])
        area_r = np.prod(rest[:, 2:] - rest[:, :2], axis=1)
        iou = inter / (area_i + area_r - inter + 1e-9)
        order = order[1:][iou <= iou_thres]
    return keep


def detect(onnx_path: str, image: np.ndarray, conf: float = 0.25, iou: float = 0.45,
           imgsz: int = 640) -> list[dict]:
    """BGR image -> [{'box': [x1,y1,x2,y2], 'conf': float, 'cls': int}] in
    original-image pixels."""
    net = cv2.dnn.readNetFromONNX(onnx_path)
    padded, r, (left, top) = letterbox(image, imgsz)
    blob = padded[..., ::-1].transpose(2, 0, 1)[None].astype(np.float32) / 255.0  # BGR->RGB NCHW
    net.setInput(blob, "images")
    pred = net.forward()[0]  # (anchors, 4+nc)

    cls_scores = pred[:, 4:]
    cls = cls_scores.argmax(1)
    score = cls_scores[np.arange(len(cls)), cls]
    m = score >= conf
    boxes, score, cls = pred[m, :4].copy(), score[m], cls[m]
    # class-offset trick so NMS is per-class in one pass (reference ops.py:263)
    keep = nms(boxes + cls[:, None] * imgsz * 2, score, iou)
    boxes, score, cls = boxes[keep], score[keep], cls[keep]
    # undo letterbox
    boxes[:, [0, 2]] = (boxes[:, [0, 2]] - left) / r
    boxes[:, [1, 3]] = (boxes[:, [1, 3]] - top) / r
    h, w = image.shape[:2]
    boxes = np.clip(boxes, 0, [w, h, w, h])
    return [
        {"box": b.tolist(), "conf": float(s), "cls": int(c)}
        for b, s, c in zip(boxes, score, cls)
    ]


def main():
    onnx_path, img_path = sys.argv[1], sys.argv[2]
    conf = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    iou = float(sys.argv[4]) if len(sys.argv) > 4 else 0.45
    image = cv2.imread(img_path)
    dets = detect(onnx_path, image, conf, iou)
    for d in dets:
        x1, y1, x2, y2 = (int(v) for v in d["box"])
        cv2.rectangle(image, (x1, y1), (x2, y2), (56, 56, 255), 2)
        cv2.putText(image, f"{d['cls']}: {d['conf']:.2f}", (x1, max(y1 - 4, 12)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (56, 56, 255), 1)
    out = "detections.jpg"
    cv2.imwrite(out, image)
    print(f"{len(dets)} detections -> {out}")


if __name__ == "__main__":
    main()
