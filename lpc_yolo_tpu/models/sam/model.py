"""SAM / MobileSAM facade: promptable segmentation.

Behavioral spec: reference models/sam/model.py (SAM facade), predict.py
(Predictor.prompt_inference:152-209, postprocess:349-387), modules/sam.py
(Sam: mean/std normalize + encoder/prompt/decoder wiring), build.py
(build_mobile_sam:55-64).

TPU design: one jitted program runs encoder + prompt encode + mask decode for
a fixed prompt budget; masks are upscaled in-graph (jax.image bilinear) to the
1024 input frame, then cropped/resized to the original image on host.

Zero-egress note: `SAM('mobile_sam')` builds the architecture with random
init; `SAM('mobile_sam.pt')` ports the torch checkpoint when one is provided
locally (same porter the parity test uses with a random-init torch build).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .prompt_mask import MaskDecoder, PromptEncoder
from .tiny_encoder import TinyViT
from .vit_encoder import VIT_CONFIGS, ImageEncoderViT

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)
IMG_SIZE = 1024


class MobileSam(nn.Module):
    """Image encoder + prompt encoder + mask decoder (modules/sam.py:17-65).

    variant selects the encoder: 'tiny' = MobileSAM TinyViT (build.py:54-63),
    'vit_b'/'vit_l'/'vit_h' = the full-size SAM ViTDet encoders (build.py:21-51).
    Prompt encoder and mask decoder are identical across variants.
    """

    dtype: Any = jnp.float32
    variant: str = "tiny"

    def setup(self):
        if self.variant == "tiny":
            self.image_encoder = TinyViT(dtype=self.dtype)
        else:
            self.image_encoder = ImageEncoderViT(dtype=self.dtype, **VIT_CONFIGS[self.variant])
        self.prompt_encoder = PromptEncoder(dtype=self.dtype)
        self.mask_decoder = MaskDecoder(dtype=self.dtype)

    def encode_image(self, x_rgb01):
        """x (B, 1024, 1024, 3) RGB in [0,1] -> (B, 64, 64, 256)."""
        x = (x_rgb01 * 255.0 - MEAN) / STD
        return self.image_encoder(x)

    def decode(self, embeddings, points, labels, masks=None):
        """embeddings (B, 64, 64, 256); points (B, N, 2) px in the 1024 frame;
        labels (B, N); masks optional (B, 256, 256, 1) prompt.
        Returns (masks (B, 4, 256, 256) logits, iou (B, 4))."""
        sparse, dense = self.prompt_encoder(points, labels, masks)
        pe = self.prompt_encoder.dense_pe()[None]  # (1, 64, 64, 256)
        pe = jnp.broadcast_to(pe, embeddings.shape)
        return self.mask_decoder(embeddings, pe, sparse, dense)

    def __call__(self, x_rgb01, points, labels, masks=None):
        emb = self.encode_image(x_rgb01)
        return self.decode(emb, points, labels, masks)


class SAM:
    """User facade (reference models/sam/model.py): `SAM('mobile_sam.pt')`
    then `.predict(img, points=..., bboxes=...)` -> list of Results."""

    @staticmethod
    def _variant_of(name: str) -> str:
        """Map checkpoint-style names to encoder variants (reference
        models/sam/model.py + build.py sam_model_map: sam_b/l/h -> ViT,
        mobile_sam -> TinyViT)."""
        stem = name.rsplit("/", 1)[-1].removesuffix(".pt").lower()
        for v in ("vit_b", "vit_l", "vit_h"):
            if stem in (v, f"sam_{v[-1]}", f"sam_{v}"):
                return v
        return "tiny"

    def __init__(self, model: str = "mobile_sam", max_points: int = 8):
        self.model_name = str(model)
        self.max_points = max_points
        self.net = MobileSam(variant=self._variant_of(str(model)))
        if str(model).endswith(".pt"):
            from .port import load_torch_sam

            self.variables = load_torch_sam(str(model), self.net)
        else:
            self.variables = jax.jit(
                lambda: self.net.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)),
                    jnp.zeros((1, max_points, 2)),
                    -jnp.ones((1, max_points), jnp.int32),
                    jnp.zeros((1, 256, 256, 1)),  # materialize mask_downscaling
                )
            )()
        self._encode = jax.jit(lambda v, x: self.net.apply(v, x, method=MobileSam.encode_image))
        self._decode = jax.jit(lambda v, e, p, l: self.net.apply(v, e, p, l, method=MobileSam.decode))
        self._emb = None
        self._img_meta = None

    # -------------------------------------------------------------- predict
    @staticmethod
    def _prep(img_bgr: np.ndarray) -> Tuple[np.ndarray, float, Tuple[int, int]]:
        """Resize longest side to 1024, pad bottom/right (predict.py:77-121)."""
        import cv2

        h0, w0 = img_bgr.shape[:2]
        r = IMG_SIZE / max(h0, w0)
        nh, nw = round(h0 * r), round(w0 * r)
        im = cv2.resize(img_bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((IMG_SIZE, IMG_SIZE, 3), np.float32)
        canvas[:nh, :nw] = im[..., ::-1].astype(np.float32) / 255.0  # BGR->RGB [0,1]
        return canvas, r, (h0, w0)

    @staticmethod
    def _fingerprint(img: np.ndarray):
        """Cheap content fingerprint so repeated predicts on the same frame
        reuse the cached embedding (reference Predictor.set_image caching)."""
        return (img.shape, bytes(img[:: max(1, img.shape[0] // 8), :: max(1, img.shape[1] // 8)].tobytes()[:4096]))

    def set_image(self, img_bgr: np.ndarray):
        """Cache image embeddings for repeated prompting (predict.py:401-424)."""
        canvas, r, (h0, w0) = self._prep(img_bgr)
        self._emb = self._encode(self.variables, jnp.asarray(canvas[None]))
        self._img_meta = (r, h0, w0)
        self._img_fp = self._fingerprint(img_bgr)

    def reset_image(self):
        self._emb = None
        self._img_meta = None

    def _prompts_to_arrays(self, points, labels, bboxes, r) -> Tuple[np.ndarray, np.ndarray]:
        """Scale prompts into the 1024 frame and pad to the static budget."""
        pts, labs = [], []
        if points is not None:
            p = np.asarray(points, np.float32).reshape(-1, 2) * r
            l = (np.ones(len(p)) if labels is None else np.asarray(labels).reshape(-1)).astype(np.int32)
            pts.append(p)
            labs.append(l)
        if bboxes is not None:
            b = np.asarray(bboxes, np.float32).reshape(-1, 4) * r
            corners = b.reshape(-1, 2, 2)
            pts.append(corners.reshape(-1, 2))
            labs.append(np.tile(np.array([2, 3], np.int32), len(b)))
        if not pts:  # center-point default
            pts = [np.array([[IMG_SIZE / 2, IMG_SIZE / 2]], np.float32)]
            labs = [np.array([1], np.int32)]
        p = np.concatenate(pts)[: self.max_points]
        l = np.concatenate(labs)[: self.max_points]
        N = self.max_points
        out_p = np.zeros((1, N, 2), np.float32)
        out_l = -np.ones((1, N), np.int32)
        out_p[0, : len(p)] = p
        out_l[0, : len(l)] = l
        return out_p, out_l

    def predict(
        self,
        source,
        points=None,
        labels=None,
        bboxes=None,
        multimask_output: bool = False,
        conf: float = 0.0,
        **kw,
    ):
        """Segment with point/box prompts; returns a list of Results."""
        import cv2

        from ...engine.results import Results

        if isinstance(source, (str,)):
            img = cv2.imread(str(source))
            path = str(source)
        else:
            img = np.asarray(source)
            path = "array"
        if self._emb is None or getattr(self, "_img_fp", None) != self._fingerprint(img):
            self.set_image(img)
        r, h0, w0 = self._img_meta
        p, l = self._prompts_to_arrays(points, labels, bboxes, r)
        masks_lr, iou = self._decode(self.variables, self._emb, jnp.asarray(p), jnp.asarray(l))
        masks_lr, iou = np.asarray(masks_lr), np.asarray(iou)  # (1,4,256,256), (1,4)

        sel = slice(1, 4) if multimask_output else slice(0, 1)
        m = masks_lr[0, sel]
        scores = iou[0, sel]
        # upscale 256 -> 1024, crop the unpadded region, resize to original
        nh, nw = round(h0 * r), round(w0 * r)
        out_masks = []
        for mm in m:
            up = cv2.resize(mm, (IMG_SIZE, IMG_SIZE), interpolation=cv2.INTER_LINEAR)
            up = up[:nh, :nw]
            up = cv2.resize(up, (w0, h0), interpolation=cv2.INTER_LINEAR)
            out_masks.append(up > 0.0)
        out_masks = np.stack(out_masks)  # (K, h0, w0) bool

        # boxes from masks + iou scores as confidence
        rows = []
        for mm, s in zip(out_masks, scores):
            ys, xs = np.nonzero(mm)
            if len(xs) == 0:
                rows.append([0, 0, 0, 0, float(s), 0])
            else:
                rows.append([xs.min(), ys.min(), xs.max(), ys.max(), float(s), 0])
        res = Results(
            orig_img=img,
            path=path,
            names={0: "object"},
            boxes=np.array(rows, np.float32),
            masks=out_masks.astype(np.float32),
        )
        return [res]

    def generate(
        self,
        source,
        points_per_side: int = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        mask_threshold: float = 0.0,
        crop_n_layers: int = 0,
        crop_overlap_ratio: float = 512 / 1500,
        crop_points_downscale_factor: int = 1,
        box_nms_thresh: float = 0.7,
        crop_nms_thresh: float = 0.7,
    ):
        """Segment-everything mode (reference models/sam/predict.py:210-330).

        Prompts a points_per_side^2 grid over each crop layer, decodes in
        static-shape chunks of points_per_batch (one compile, reused), filters
        by predicted IoU and stability score (amg.calculate_stability_score),
        dedups per crop with greedy box NMS, uncrops, and dedups across crops.
        Returns a one-element list of Results whose masks cover the image.
        """
        import cv2

        from ...engine.results import Results
        from .amg import (
            batched_mask_to_box,
            build_all_layer_point_grids,
            calculate_stability_score,
            generate_crop_boxes,
            greedy_nms,
            uncrop_boxes_xyxy,
        )

        if isinstance(source, str):
            img = cv2.imread(str(source))
            path = str(source)
        else:
            img = np.asarray(source)
            path = "array"
        h0, w0 = img.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes((h0, w0), crop_n_layers, crop_overlap_ratio)
        grids = build_all_layer_point_grids(
            points_per_side, crop_n_layers, crop_points_downscale_factor
        )

        if not hasattr(self, "_decode_chunk"):
            net = self.net

            def _chunk(v, emb, p, l):
                embs = jnp.broadcast_to(emb, (p.shape[0],) + emb.shape[1:])
                return net.apply(v, embs, p, l, method=MobileSam.decode)

            self._decode_chunk = jax.jit(_chunk)

        kept_boxes, kept_scores, kept_lr, kept_meta = [], [], [], []
        for crop_box, layer in zip(crop_boxes, layer_idxs):
            x0, y0, x1, y1 = crop_box
            crop = img[y0:y1, x0:x1]
            canvas, r, (ch, cw) = self._prep(crop)
            emb = self._encode(self.variables, jnp.asarray(canvas[None]))
            # grid points in crop pixels -> model (1024) frame
            pts_img = grids[layer] * np.array([cw, ch], np.float32)
            pts_model = pts_img * r
            n = len(pts_model)
            c_boxes, c_scores, c_lr = [], [], []
            for i0 in range(0, n, points_per_batch):
                chunk = pts_model[i0 : i0 + points_per_batch]
                B = points_per_batch
                p = np.zeros((B, 2, 2), np.float32)  # point + torch pad point
                l = -np.ones((B, 2), np.int32)
                p[: len(chunk), 0] = chunk
                l[: len(chunk), 0] = 1
                masks_lr, iou = self._decode_chunk(
                    self.variables, emb, jnp.asarray(p), jnp.asarray(l)
                )
                masks_lr = np.asarray(masks_lr)[: len(chunk), 1:4]  # multimask slice
                iou = np.asarray(iou)[: len(chunk), 1:4]
                m = masks_lr.reshape(-1, masks_lr.shape[-2], masks_lr.shape[-1])
                s = iou.reshape(-1)
                good = s > pred_iou_thresh
                if not good.any():
                    continue
                m, s = m[good], s[good]
                stab = calculate_stability_score(m, mask_threshold, stability_score_offset)
                good = stab >= stability_score_thresh
                if not good.any():
                    continue
                m, s = m[good], s[good]
                mb = m > mask_threshold
                boxes_lr = batched_mask_to_box(mb)  # 256-frame
                nonempty = (boxes_lr[:, 2] > boxes_lr[:, 0]) & (boxes_lr[:, 3] > boxes_lr[:, 1])
                if not nonempty.any():
                    continue
                # 256 logit frame -> 1024 model frame -> crop pixels
                scale = (IMG_SIZE / m.shape[-1]) / r
                c_boxes.append(boxes_lr[nonempty] * scale)
                c_scores.append(s[nonempty])
                c_lr.append(mb[nonempty])
            if not c_boxes:
                continue
            c_boxes = np.concatenate(c_boxes)
            c_scores = np.concatenate(c_scores)
            c_lr = np.concatenate(c_lr)
            keep = greedy_nms(c_boxes, c_scores, box_nms_thresh)
            for i in keep:
                kept_boxes.append(uncrop_boxes_xyxy(c_boxes[i], crop_box))
                kept_scores.append(c_scores[i])
                kept_lr.append(c_lr[i])
                kept_meta.append((crop_box, r, ch, cw))

        if not kept_boxes:
            return [Results(orig_img=img, path=path, names={0: "object"},
                            boxes=np.zeros((0, 6), np.float32),
                            masks=np.zeros((0, h0, w0), np.float32))]

        kept_boxes = np.stack(kept_boxes)
        kept_scores = np.asarray(kept_scores)
        if len(crop_boxes) > 1:
            keep = greedy_nms(kept_boxes, kept_scores, crop_nms_thresh)
        else:
            keep = np.arange(len(kept_boxes))

        out_masks, rows = [], []
        for i in keep:
            (cb, r, ch, cw), mlr = kept_meta[i], kept_lr[i]
            nh, nw = round(ch * r), round(cw * r)
            up = cv2.resize(mlr.astype(np.float32), (IMG_SIZE, IMG_SIZE), interpolation=cv2.INTER_LINEAR)
            up = up[:nh, :nw]
            up = cv2.resize(up, (cw, ch), interpolation=cv2.INTER_LINEAR) > 0.5
            full = np.zeros((h0, w0), bool)
            full[cb[1] : cb[1] + ch, cb[0] : cb[0] + cw] = up
            out_masks.append(full)
            b = kept_boxes[i]
            rows.append([b[0], b[1], b[2], b[3], float(kept_scores[i]), 0])
        res = Results(
            orig_img=img, path=path, names={0: "object"},
            boxes=np.array(rows, np.float32),
            masks=np.stack(out_masks).astype(np.float32),
        )
        return [res]

    def __call__(self, source, **kw):
        return self.predict(source, **kw)

    @property
    def n_params(self) -> int:
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(self.variables["params"]))
