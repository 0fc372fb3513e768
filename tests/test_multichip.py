"""Regression guard for the driver's multi-chip dry run.

Round 1's driver dryrun failed because ``dryrun_multichip`` assumed the
virtual 8-CPU mesh already existed (MULTICHIP_r01.json ok=false).  This test
calls the exact driver entry points so the failure mode can never silently
regress: under pytest the backend is already provisioned by conftest.py, and
``_ensure_virtual_devices`` must detect that and be a no-op; in the driver's
fresh process it must self-provision.
"""

import subprocess
import sys

import pytest


def test_ensure_virtual_devices_noop_when_initialized():
    """The round-1 regression in miniature: under pytest the backend is
    already provisioned (conftest), and _ensure_virtual_devices must detect
    that and leave it alone instead of racing jax.config after init."""
    import jax

    import __graft_entry__

    n_before = len(jax.devices())
    __graft_entry__._ensure_virtual_devices(8)
    assert len(jax.devices()) == n_before == 8


@pytest.mark.slow
def test_dryrun_multichip_in_process():
    """The full driver entry (real v10n train step over the 8-device mesh).
    ~2 min of XLA:CPU compile — slow-gated; the driver itself runs this
    every round (MULTICHIP_rN.json), so default suite runs keep only the
    cheap _ensure_virtual_devices guard above."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_fresh_process():
    """Simulate the driver: a fresh interpreter with no mesh pre-provisioned."""
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=__file__.rsplit("/tests/", 1)[0],
    )
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "OK" in r.stdout


def test_mesh_sharded_validation(tmp_path):
    """Validator mesh= shards the batch axis over the data mesh; metrics must
    be bit-identical to the single-device path (pure DP, no collectives)."""
    import numpy as np

    from lpc_yolo_tpu import YOLO
    from lpc_yolo_tpu.data import make_synthetic_dataset
    from lpc_yolo_tpu.parallel.mesh import data_parallel_mesh

    data = make_synthetic_dataset(tmp_path / "ds", n_train=2, n_val=8, imgsz=64, nc=3)
    from pathlib import Path

    m = YOLO(Path(__file__).parent / "assets" / "tiny-v10.yaml", nc=3)
    res_single = m.val(data=data, imgsz=64, batch=8, max_gt=8)
    mesh = data_parallel_mesh(batch_size=8)
    assert mesh.size > 1  # conftest provisions the 8-device CPU mesh
    res_mesh = m.val(data=data, imgsz=64, batch=8, max_gt=8, mesh=mesh)
    for k, v in res_single.items():
        assert np.isclose(res_mesh[k], v, atol=1e-6), (k, res_mesh[k], v)
