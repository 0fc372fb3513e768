"""SAM / MobileSAM parity + facade tests.

Strategy (no downloadable weights in this env): build the torch reference
MobileSAM with RANDOM init from /root/reference's own code, port its
state_dict through models/sam/port.py, and assert forward agreement — this
validates both the architecture and the porter, so a real mobile_sam.pt
loads correctly wherever one exists.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu.models.sam import SAM, MobileSam, port_sam_state_dict

from test_ops import HAS_REF, _ref_ultralytics

TOTAL_PARAMS = 9_808_708  # torch ex-classifier-head + pe gaussian buffer


def _init_vars(net, max_points=8):
    return net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1024, 1024, 3)),
        jnp.zeros((1, max_points, 2)),
        -jnp.ones((1, max_points), jnp.int32),
        jnp.zeros((1, 256, 256, 1)),
    )


def test_mobile_sam_param_parity():
    net = MobileSam()
    v = jax.eval_shape(lambda: _init_vars(net))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(v["params"]))
    assert n == TOTAL_PARAMS


@pytest.fixture(scope="module")
def torch_sam():
    if not HAS_REF:
        pytest.skip("torch reference not mounted")
    _ref_ultralytics()
    import torch

    from ultralytics.models.sam.build import _build_sam

    torch.manual_seed(0)
    m = _build_sam(
        encoder_embed_dim=[64, 128, 160, 320], encoder_depth=[2, 2, 6, 2],
        encoder_num_heads=[2, 4, 5, 10], encoder_global_attn_indexes=None, mobile_sam=True,
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def ported(torch_sam):
    net = MobileSam()
    variables = port_sam_state_dict(torch_sam.state_dict(), _init_vars(net))
    return net, variables


@pytest.mark.slow  # full 1024x1024 TinyViT forward in BOTH torch and jax: ~5 min on the 1-vCPU runner
@pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")
def test_image_encoder_forward_parity(torch_sam, ported):
    import torch

    net, variables = ported
    rng = np.random.RandomState(0)
    # torch TinyViT bakes input_resolution=1024 into its blocks; full size only
    x = rng.rand(1, 1024, 1024, 3).astype(np.float32)
    with torch.no_grad():
        # reference normalizes inside Sam.preprocess; compare raw encoders
        t_out = torch_sam.image_encoder(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(
        net.apply(variables, jnp.asarray(x), method=lambda s, x: s.image_encoder(x))
    )
    # NHWC -> NCHW for comparison
    np.testing.assert_allclose(j_out.transpose(0, 3, 1, 2), t_out, atol=2e-3, rtol=1e-3)


@pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")
def test_prompt_and_decoder_forward_parity(torch_sam, ported):
    import torch

    net, variables = ported
    rng = np.random.RandomState(1)
    emb = rng.randn(1, 64, 64, 256).astype(np.float32) * 0.1
    pts = np.array([[[200.0, 300.0], [700.0, 500.0]]], np.float32)
    labs = np.array([[1, 0]], np.float32)

    with torch.no_grad():
        sparse_t, dense_t = torch_sam.prompt_encoder(
            points=(torch.from_numpy(pts), torch.from_numpy(labs)), boxes=None, masks=None
        )
        masks_t, iou_t = torch_sam.mask_decoder(
            image_embeddings=torch.from_numpy(emb.transpose(0, 3, 1, 2)),
            image_pe=torch_sam.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sparse_t,
            dense_prompt_embeddings=dense_t,
            multimask_output=True,
        )

    # torch pads with one (0,0)/-1 point when boxes is None; mirror it
    jp = np.concatenate([pts, np.zeros((1, 1, 2), np.float32)], axis=1)
    jl = np.concatenate([labs, -np.ones((1, 1), np.float32)], axis=1).astype(np.int32)
    masks_j, iou_j = net.apply(
        variables, jnp.asarray(emb), jnp.asarray(jp), jnp.asarray(jl), method=MobileSam.decode
    )
    masks_j, iou_j = np.asarray(masks_j)[:, 1:4], np.asarray(iou_j)[:, 1:4]
    np.testing.assert_allclose(iou_j, iou_t.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(masks_j, masks_t.numpy(), atol=2e-3, rtol=1e-2)


@pytest.fixture(scope="module")
def sam_facade():
    return SAM("mobile_sam")


def test_sam_facade_point_and_box_prompts(sam_facade, tmp_path):
    import cv2

    img = np.full((120, 160, 3), 40, np.uint8)
    cv2.circle(img, (80, 60), 30, (220, 220, 220), -1)
    sam = sam_facade
    res = sam.predict(img, points=[[80, 60]])
    assert len(res) == 1 and res[0].masks is not None
    assert res[0].masks.shape[1:] == (120, 160)
    res2 = sam.predict(img, bboxes=[[40, 25, 115, 95]])
    assert res2[0].masks is not None



def test_amg_helpers():
    from lpc_yolo_tpu.models.sam.amg import (
        batched_mask_to_box,
        build_all_layer_point_grids,
        build_point_grid,
        calculate_stability_score,
        generate_crop_boxes,
        greedy_nms,
    )

    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert abs(g[0, 0] - 1 / 8) < 1e-6 and abs(g[-1, 1] - 7 / 8) < 1e-6

    grids = build_all_layer_point_grids(8, 1, 2)
    assert len(grids) == 2 and len(grids[1]) == 16  # 8/2 per side

    cbs, layers = generate_crop_boxes((100, 200), 1, 0.2)
    assert cbs[0] == [0, 0, 200, 100] and layers[0] == 0
    assert len(cbs) == 1 + 4 and set(layers[1:]) == {1}
    for x0, y0, x1, y1 in cbs[1:]:
        assert 0 <= x0 < x1 <= 200 and 0 <= y0 < y1 <= 100

    logits = np.full((2, 8, 8), -5.0, np.float32)
    logits[0, 2:6, 2:6] = 5.0  # sharp mask: stable
    logits[1] = np.linspace(-1, 1, 64, dtype=np.float32).reshape(8, 8)  # soft: unstable
    st = calculate_stability_score(logits, 0.0, 1.0)
    assert st[0] == 1.0 and st[1] < 0.9

    m = np.zeros((1, 8, 8), bool)
    m[0, 2:5, 3:7] = True
    assert batched_mask_to_box(m)[0].tolist() == [3, 2, 7, 5]

    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    keep = greedy_nms(boxes, np.array([0.9, 0.8, 0.7], np.float32), 0.5)
    assert sorted(keep.tolist()) == [0, 2]


def test_sam_generate_everything(sam_facade):
    """generate(): grid prompting + stability/IoU filtering + NMS dedup runs
    end-to-end and returns coherent full-frame masks (reference
    models/sam/predict.py:210-330). Random-init weights, so thresholds are
    disabled and only the mechanics are asserted."""
    import cv2

    img = np.full((96, 128, 3), 30, np.uint8)
    cv2.circle(img, (40, 48), 20, (200, 200, 200), -1)
    cv2.rectangle(img, (80, 20), (120, 70), (120, 180, 90), -1)
    res = sam_facade.generate(
        img, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=-1e9, stability_score_thresh=0.0,
    )
    assert len(res) == 1
    r = res[0]
    assert r.masks is not None and r.masks.data.shape[1:] == (96, 128)
    assert len(r.boxes) == len(r.masks.data)
    assert len(r.masks.data) >= 1  # dedup keeps at least one mask
    conf = r.boxes.conf
    assert np.isfinite(conf).all()  # predicted-IoU scores carried as confidence
