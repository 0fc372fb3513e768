"""Rotated NMS: keep-set parity vs the torch reference's probIoU fast-NMS.

Reference: ultralytics/utils/ops.py:143-161 (nms_rotated via batch_probiou).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from lpc_yolo_tpu.ops.postprocess import nms_rotated

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "ultralytics"))


def _rand_rboxes(rng, n):
    rb = np.zeros((n, 5), np.float32)
    rb[:, 0] = rng.rand(n) * 600 + 20
    rb[:, 1] = rng.rand(n) * 600 + 20
    rb[:, 2] = rng.rand(n) * 80 + 8
    rb[:, 3] = rng.rand(n) * 80 + 8
    rb[:, 4] = (rng.rand(n) - 0.5) * np.pi
    return rb


def test_rotated_nms_static_shape_and_order():
    rng = np.random.RandomState(0)
    rb = _rand_rboxes(rng, 200)
    scores = rng.rand(200, 1).astype(np.float32)
    det = nms_rotated(jnp.asarray(rb)[None], jnp.asarray(scores)[None], 0.05, 0.45, 64)
    det = np.asarray(det)[0]
    assert det.shape == (64, 7)
    conf = det[:, 5]
    assert (np.diff(conf[conf > 0]) <= 1e-6).all(), "detections must be score-sorted"
    # suppressed rows zeroed with label -1
    assert (det[conf == 0, :5] == 0).all()
    assert (det[conf == 0, 6] == -1).all()


def test_rotated_nms_suppresses_duplicates():
    """Two near-identical rotated boxes -> only the higher-scoring survives;
    a box rotated 90 degrees with swapped w/h is the SAME box and must also
    be suppressed (the axis-aligned-hull approximation got this wrong)."""
    rb = np.array(
        [
            [100, 100, 60, 20, 0.3],
            [100, 100, 60, 20, 0.31],  # near-duplicate
            [100, 100, 20, 60, 0.3 + np.pi / 2],  # same box, rotated param
            [400, 400, 60, 20, 1.0],  # far away
        ],
        np.float32,
    )
    scores = np.array([[0.9], [0.8], [0.7], [0.6]], np.float32)
    det = np.asarray(nms_rotated(jnp.asarray(rb)[None], jnp.asarray(scores)[None], 0.05, 0.45, 4))[0]
    kept = det[det[:, 5] > 0]
    assert len(kept) == 2
    assert np.allclose(sorted(kept[:, 5].tolist()), [0.6, 0.9])


@pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")
def test_rotated_nms_matches_reference_keepset():
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_ops import _ref_ultralytics

    _ref_ultralytics()
    import torch
    from ultralytics.utils.ops import nms_rotated as ref_nms

    rng = np.random.RandomState(3)
    for trial in range(5):
        n = 120
        rb = _rand_rboxes(rng, n)
        scores = (rng.rand(n).astype(np.float32) * 0.9 + 0.05).reshape(n, 1)
        ref_keep = ref_nms(
            torch.tensor(np.concatenate([rb[:, :4], rb[:, 4:5]], 1)),
            torch.tensor(scores[:, 0]),
            0.45,
        ).numpy()
        det = np.asarray(
            nms_rotated(jnp.asarray(rb)[None], jnp.asarray(scores)[None], 0.0, 0.45, n)
        )[0]
        ours = det[det[:, 5] > 0]
        ref_scores = np.sort(scores[ref_keep, 0])
        our_scores = np.sort(ours[:, 5])
        assert len(ours) == len(ref_keep), f"trial {trial}: {len(ours)} vs {len(ref_keep)}"
        np.testing.assert_allclose(our_scores, ref_scores, atol=1e-6)
