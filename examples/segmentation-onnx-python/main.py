"""OpenCV-DNN client for the exported SEGMENTATION ONNX model.

Mirrors the reference seg client (examples/YOLOv8-Segmentation-ONNXRuntime-
Python/main.py:1-342) on the task-complete export artifact: the seg `.onnx`
carries THREE outputs (engine/exporter.py traces whatever the head emits,
like the reference's export-mode Segment at nn/modules/head.py:104-128):

    pred  (B, anchors, 4+nc)  xyxy boxes in letterbox px + sigmoid scores
    mc    (B, anchors, 32)    per-anchor mask coefficients
    proto (B, Hp, Wp, 32)     mask prototypes (NHWC, Hp=Wp=imgsz/4)

A detection's mask is sigmoid(mc @ proto) cropped to its box — all numpy
here; no framework imports.

Usage:
    python main.py model-seg.onnx image.jpg [conf] [iou]
"""

from __future__ import annotations

import sys

import cv2
import numpy as np


def letterbox(img: np.ndarray, size: int) -> tuple[np.ndarray, float, tuple[int, int]]:
    """Aspect-preserving resize onto a gray size x size canvas."""
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


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def segment(
    onnx_path: str,
    im0: np.ndarray,
    conf: float = 0.25,
    iou: float = 0.45,
    imgsz: int = 640,
) -> list[dict]:
    """Run the seg artifact on one BGR image.

    Returns one dict per instance: box (xyxy, original-image px), cls, conf,
    and a full-resolution boolean mask.
    """
    net = cv2.dnn.readNetFromONNX(onnx_path)
    lb, r, (left, top) = letterbox(im0, imgsz)
    blob = lb[..., ::-1].astype(np.float32) / 255.0  # BGR->RGB, [0,1]
    net.setInput(blob.transpose(2, 0, 1)[None])
    pred, mc, proto = net.forward(["pred", "mc", "proto"])

    p = pred[0]  # (A, 4+nc)
    cls_scores = p[:, 4:]
    cls_ids = cls_scores.argmax(1)
    scores = cls_scores[np.arange(len(p)), cls_ids]
    m = scores >= conf
    boxes, scores, cls_ids, coef = p[m, :4], scores[m], cls_ids[m], mc[0][m]
    keep = nms(boxes, scores, iou)
    boxes, scores, cls_ids, coef = boxes[keep], scores[keep], cls_ids[keep], coef[keep]

    ph, pw, nm = proto.shape[1:]
    masks = sigmoid(coef @ proto[0].reshape(-1, nm).T).reshape(-1, ph, pw)
    sx, sy = pw / imgsz, ph / imgsz
    h0, w0 = im0.shape[:2]
    out = []
    for i, mk in enumerate(masks):
        x1, y1, x2, y2 = boxes[i]
        # crop in proto space, upsample, cut the letterbox pad, map to im0
        yy, xx = np.ogrid[:ph, :pw]
        crop = (xx >= x1 * sx) & (xx < x2 * sx) & (yy >= y1 * sy) & (yy < y2 * sy)
        full = cv2.resize(np.where(crop, mk, 0.0), (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
        nh, nw = round(h0 * r), round(w0 * r)
        content = full[top : top + nh, left : left + nw]
        mask0 = cv2.resize(content, (w0, h0), interpolation=cv2.INTER_LINEAR) > 0.5
        box0 = ((np.array([x1, y1, x2, y2]) - [left, top, left, top]) / r)
        box0 = np.clip(box0, 0, [w0, h0, w0, h0]).round().astype(int)
        out.append(
            {"box": box0.tolist(), "cls": int(cls_ids[i]), "conf": float(scores[i]), "mask": mask0}
        )
    return out


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    onnx_path, img_path = sys.argv[1], sys.argv[2]
    conf = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    iou = float(sys.argv[4]) if len(sys.argv) > 4 else 0.45
    im0 = cv2.imread(img_path)
    assert im0 is not None, f"cannot read {img_path}"
    dets = segment(onnx_path, im0, conf, iou)
    rng = np.random.RandomState(3)
    overlay = im0.copy()
    for i, d in enumerate(dets):
        color = rng.randint(0, 255, 3).tolist()
        overlay[d["mask"]] = (0.5 * overlay[d["mask"]] + 0.5 * np.array(color)).astype(np.uint8)
        x1, y1, x2, y2 = d["box"]
        cv2.rectangle(overlay, (x1, y1), (x2, y2), color, 2)
        cv2.putText(overlay, f"{d['cls']} {d['conf']:.2f}", (x1, max(y1 - 4, 12)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
        print(f"det {i}: cls={d['cls']} conf={d['conf']:.3f} box={d['box']} "
              f"mask_px={int(d['mask'].sum())}")
    cv2.imwrite("seg_result.jpg", overlay)
    print(f"saved seg_result.jpg ({len(dets)} instances)")


if __name__ == "__main__":
    main()
