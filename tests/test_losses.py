"""Loss stack tests: assigner behavior + full-loss parity vs torch reference."""

import os
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu.losses import task_aligned_assigner, v8_detection_loss, v10_detect_loss
from lpc_yolo_tpu.nn import build_model
from lpc_yolo_tpu.ops import make_anchors

CFG = Path(__file__).resolve().parents[1] / "lpc_yolo_tpu" / "cfg" / "models"
REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "ultralytics"))


def _rand_gts(B, M, n_real, imgsz, nc, seed=0):
    """Random padded gt boxes; first n_real rows valid per image."""
    rng = np.random.RandomState(seed)
    xy = rng.rand(B, M, 2) * (imgsz * 0.7)
    wh = rng.rand(B, M, 2) * (imgsz * 0.3) + 8
    boxes = np.concatenate([xy, xy + wh], -1).clip(0, imgsz).astype(np.float32)
    labels = rng.randint(0, nc, (B, M)).astype(np.int32)
    mask = np.zeros((B, M), bool)
    mask[:, :n_real] = True
    boxes[~mask] = 0
    labels[~mask] = 0
    return labels, boxes, mask


def test_assigner_basic():
    """A lone gt must get at least one fg anchor; empty image gets none."""
    B, nc = 2, 4
    pts, strides = make_anchors([(8, 8), (4, 4), (2, 2)], [8, 16, 32])
    A = pts.shape[0]
    rng = np.random.RandomState(0)
    pd_scores = jnp.asarray(rng.rand(B, A, nc).astype(np.float32)) * 0.5
    pd_bboxes = jnp.asarray(
        np.concatenate([rng.rand(B, A, 2) * 30, 30 + rng.rand(B, A, 2) * 30], -1).astype(np.float32)
    )
    labels = jnp.zeros((B, 8), jnp.int32)
    boxes = jnp.zeros((B, 8, 4), jnp.float32)
    boxes = boxes.at[0, 0].set(jnp.asarray([8.0, 8.0, 40.0, 40.0]))
    mask = jnp.zeros((B, 8), bool).at[0, 0].set(True)

    res = task_aligned_assigner(
        pd_scores, pd_bboxes, pts * strides, labels, boxes, mask, topk=10, num_classes=nc
    )
    assert bool(res.fg_mask[0].any())
    assert not bool(res.fg_mask[1].any())  # no gts in image 1
    assert float(res.target_scores[1].sum()) == 0.0


def test_v8_loss_runs_and_is_finite():
    m = build_model(CFG / "v10/yolov10n.yaml")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32))
    out, _ = m.apply(v, x, training=True, mutable=["batch_stats"])
    labels, boxes, mask = _rand_gts(2, 16, 5, 64, 80)
    total, items = v10_detect_loss(
        out, jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(mask), m.strides, 80
    )
    assert np.isfinite(float(total))
    assert items.shape == (6,)
    assert (np.asarray(items) >= 0).all()


def test_loss_zero_gt_no_nan():
    m = build_model(CFG / "v10/yolov10n.yaml")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    x = jnp.zeros((1, 64, 64, 3))
    out, _ = m.apply(v, x, training=True, mutable=["batch_stats"])
    labels = jnp.zeros((1, 8), jnp.int32)
    boxes = jnp.zeros((1, 8, 4), jnp.float32)
    mask = jnp.zeros((1, 8), bool)
    total, items = v10_detect_loss(out, labels, boxes, mask, m.strides, 80)
    assert np.isfinite(float(total))


@pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")
def test_v10_loss_parity_vs_reference():
    """Same weights, same image, same gts -> same loss values as the reference."""
    from test_ops import _ref_ultralytics

    _ref_ultralytics()
    import torch
    from ultralytics.nn.tasks import YOLOv10DetectionModel

    from lpc_yolo_tpu.utils.torch_port import port_state_dict

    imgsz = 64
    tm = YOLOv10DetectionModel(f"{REF}/ultralytics/cfg/models/v10/yolov10n.yaml", verbose=False)
    tm.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    tm.train()

    m = build_model(CFG / "v10/yolov10n.yaml")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)), training=True)
    v2 = port_state_dict(tm.state_dict(), v)

    B, n_real, nc = 2, 4, 80
    x = np.random.RandomState(0).rand(B, 3, imgsz, imgsz).astype(np.float32)
    labels, boxes, mask = _rand_gts(B, 8, n_real, imgsz, nc, seed=3)

    # reference batch format: flat rows, normalized xywh
    bidx, cls_rows, box_rows = [], [], []
    for b in range(B):
        for j in range(n_real):
            x1, y1, x2, y2 = boxes[b, j]
            bidx.append(b)
            cls_rows.append([labels[b, j]])
            box_rows.append([(x1 + x2) / 2 / imgsz, (y1 + y2) / 2 / imgsz, (x2 - x1) / imgsz, (y2 - y1) / imgsz])
    batch = {
        "batch_idx": torch.tensor(bidx, dtype=torch.float32),
        "cls": torch.tensor(cls_rows, dtype=torch.float32),
        "bboxes": torch.tensor(box_rows, dtype=torch.float32),
        "img": torch.tensor(x),
    }
    with torch.no_grad():
        t_total, t_items = tm.loss(batch)

    out, _ = m.apply(v2, jnp.asarray(x.transpose(0, 2, 3, 1)), training=True, mutable=["batch_stats"])
    j_total, j_items = v10_detect_loss(
        out, jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(mask), m.strides, nc
    )
    np.testing.assert_allclose(np.asarray(j_items), t_items.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(j_total), float(t_total.numpy()), rtol=2e-3)


def test_cdn_group_shapes_and_semantics():
    """get_cdn_group (models/utils/ops.py:153): static 2GM queries, positives
    jittered inside the box, negatives pushed outside, padded slots zeroed."""
    import jax
    import jax.numpy as jnp

    from lpc_yolo_tpu.losses.detr import get_cdn_attn_mask, get_cdn_group

    B, M, nc, hd, nq = 2, 5, 7, 16, 30
    cls = jnp.array(np.random.RandomState(0).randint(0, nc, (B, M)))
    boxes = jnp.tile(jnp.array([[0.5, 0.5, 0.2, 0.2]], jnp.float32), (B, M, 1))
    mask = jnp.array([[True] * 3 + [False] * 2, [True] * 5])
    table = jnp.array(np.random.RandomState(1).randn(nc, hd), jnp.float32)
    emb, bbox_logit, attn, G = get_cdn_group(
        cls, boxes, mask, nc, table, jax.random.PRNGKey(0), num_queries=nq
    )
    assert G == 100 // M and emb.shape == (B, 2 * G * M, hd)
    assert bbox_logit.shape == (B, 2 * G * M, 4)
    assert attn.shape == (2 * G * M + nq, 2 * G * M + nq)
    # padded gt slots have zero embeddings
    e = np.asarray(emb).reshape(B, 2 * G, M, hd)
    assert np.abs(e[0, :, 3:]).max() == 0.0
    assert np.abs(e[0, :, :3]).max() > 0.0
    # negatives (groups G..2G-1) are noisier than positives on average
    bb = jax.nn.sigmoid(np.asarray(bbox_logit)).reshape(B, 2 * G, M, 4)
    d_pos = np.abs(bb[1, :G] - np.asarray(boxes[1]).reshape(1, M, 4)).mean()
    d_neg = np.abs(bb[1, G:] - np.asarray(boxes[1]).reshape(1, M, 4)).mean()
    assert d_neg > d_pos
    # mask semantics: matching queries blocked from dn; dn groups isolated
    num_dn = 2 * G * M
    am = np.asarray(get_cdn_attn_mask(M, G, nq))
    assert am[num_dn:, :num_dn].all() and not am[num_dn:, num_dn:].any()
    assert am[0, 2 * M] and not am[0, 0]
