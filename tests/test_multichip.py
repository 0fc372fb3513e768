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


def test_dryrun_multichip_in_process():
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
