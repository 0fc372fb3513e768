"""TorchScript export: jaxpr->torch interpreter validated by an INDEPENDENT
runtime — the artifact is executed by torch.jit.load (LibTorch's serialized
module format, no JAX in the loop). Mirrors the reference's
format='torchscript' export (engine/exporter.py:308-330) whose C++ examples
consume the same artifact via torch::jit::load.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.engine.exporter import export_model

torch = pytest.importorskip("torch")


def _perturb(yolo, scale=0.02):
    """Break the init-time score ties: a freshly-built v10 head's cls logits
    are bias-only (zero-init final conv), i.e. constant per level — top-k
    order on such all-tied scores is runtime-defined (torch.topk is unstable)
    and label comparisons would measure sort stability, not correctness."""
    import jax

    rng = np.random.RandomState(0)
    yolo.variables = jax.tree.map(
        lambda x: x + (scale * rng.standard_normal(x.shape)).astype(x.dtype), yolo.variables
    )
    return yolo


def _canon(det):
    """Row order canonical under top-k tie permutation: lexsort full rows
    (primary key x1, then y1, ...). Logically-identical rows across runtimes
    differ by <=1e-5 while distinct detections differ by whole pixels, so the
    sorted sequences align row-for-row."""
    key = det[0]
    return det[:, np.lexsort(key.T[::-1]), :]


def _export_and_compare(yolo, tmp_path, imgsz=64, raw_head=False):
    """Export and check torch.jit parity. v10 models without raw_head emit
    the decoded (B, max_det, 6) graph (reference head.py:515-523 semantics)."""
    from lpc_yolo_tpu.ops.postprocess import v10_detections

    _perturb(yolo)
    path = export_model(yolo, fmt="torchscript", imgsz=imgsz, out_dir=tmp_path, raw_head=raw_head)
    img = np.random.rand(1, 3, imgsz, imgsz).astype(np.float32)
    decoded = not raw_head and yolo.model.specs[-1].module == "v10Detect"
    extra = {"config.txt": ""}
    mod = torch.jit.load(path, _extra_files=extra)
    with torch.no_grad():
        out = mod(torch.from_numpy(img)).numpy()
    if decoded:
        # Random-weight class scores are near-tied, so ~5e-4 of conv FP noise
        # between runtimes flips top-k rankings: validate the IN-GRAPH decode
        # against the host decode of the SAME runtime's raw output (the raw
        # head's jax-parity is covered by the raw_head branch below).
        raw_path = export_model(yolo, fmt="torchscript", imgsz=imgsz,
                                out_dir=tmp_path / "raw", raw_head=True)
        raw_mod = torch.jit.load(raw_path)
        with torch.no_grad():
            pred_t = raw_mod(torch.from_numpy(img)).numpy()
        ref = np.asarray(v10_detections(jnp.asarray(pred_t), 300, yolo.model.nc))
        assert out.shape == ref.shape
        assert (np.sort(out[0, :, 5]) == np.sort(ref[0, :, 5])).all()
        # bitwise-equal scores at different anchors are genuine top-k TIES
        # whose relative order is runtime-defined — compare the detection SET:
        # canonicalize both row orders by full-row lexsort, then allclose
        np.testing.assert_allclose(_canon(out), _canon(ref), atol=1e-5, rtol=1e-5)
    else:
        ref = np.asarray(
            yolo.model.apply(yolo.variables, jnp.asarray(img), training=False, input_layout="NCHW")["pred"]
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)
    meta = json.loads(extra["config.txt"])
    assert meta["nc"] == yolo.model.nc
    return path


@pytest.fixture(scope="module")
def v10_ts(tmp_path_factory):
    """v10n stresses PSA attention (matmul/softmax/permute), SCDown, CIB."""
    yolo = YOLO("yolov10n.yaml", nc=3)
    tmp = tmp_path_factory.mktemp("ts_v10")
    path = _export_and_compare(yolo, tmp)
    return yolo, path


def test_torchscript_v10_parity(v10_ts):
    _, path = v10_ts
    assert path.endswith(".torchscript")


def test_torchscript_v10_raw_head_optout(tmp_path):
    """raw_head=True restores the raw pred-map artifact for v10."""
    _export_and_compare(YOLO("yolov10n.yaml", nc=3), tmp_path, raw_head=True)


def test_torchscript_lpc_parity(tmp_path):
    """The fork's namesake graph: space_to_depth / SPDConv / SPCA / LPC / CBAM
    (strided-slice gathers + maxpool + attention all in one trace)."""
    _export_and_compare(YOLO("yolov10-SPD-Conv-Tiny-CBAM-LPC.yaml", nc=3), tmp_path)


def test_autobackend_torchscript_runtime(v10_ts):
    """AutoBackend's torchscript row: LibTorch-format module + host top-k
    decode agree with the in-framework predict path."""
    from lpc_yolo_tpu.nn.autobackend import AutoBackend
    from lpc_yolo_tpu.ops.postprocess import v10_detections

    yolo, path = v10_ts
    backend = AutoBackend(path, imgsz=64)
    img = np.random.rand(1, 64, 64, 3).astype(np.float32)
    det = backend.forward(img)
    assert det.shape == (1, 300, 6)
    pred = yolo.model.apply(yolo.variables, jnp.asarray(img), training=False)["pred"]
    want = np.asarray(v10_detections(pred, 300, yolo.model.nc))
    # score vectors (sorted desc by construction) are rank-flip-stable under
    # the ~5e-4 inter-runtime conv FP noise; exact label order is not (random
    # weights near-tie the classes) — decode-vs-decode parity is covered by
    # _export_and_compare
    np.testing.assert_allclose(det[:, :, 4], want[:, :, 4], atol=1e-3)
    assert set(np.unique(det[0, :, 5])) <= set(range(yolo.model.nc))
