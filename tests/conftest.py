"""Test config: force an 8-device virtual CPU platform so pjit/sharding paths
are exercised without TPU hardware (mirrors the reference's gap — it had no
sub-2-GPU distributed tests; XLA's host-device simulation lets us do better).

Gotcha: this environment's axon sitecustomize imports jax at interpreter
start, so JAX_PLATFORMS in os.environ is already consumed. XLA_FLAGS is read
lazily at backend init, and jax.config.update('jax_platforms') works any time
before the first device query — use both, not env vars.
"""

import os
import tempfile

# Isolate persisted user settings (utils/infra.py USER_CONFIG_DIR reads this
# env at import): without it, a `yolo login`/`yolo settings` run on the same
# machine leaks api_key/dirs into the suite (and the suite's writes would
# clobber the user's real settings.yaml).
os.environ["LPC_YOLO_CONFIG_DIR"] = tempfile.mkdtemp(prefix="lpc_yolo_test_cfg_")

# opt-level 0 halves XLA:CPU compile time (the suite's dominant cost on the
# 1-vCPU runner: 125s -> 60s for a tiny train run) with identical test-scale
# numerics; the TPU serving/bench paths never see this flag.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8 --xla_backend_optimization_level=0"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: train-step compiles dominate suite wall-clock
# (round-1 suite took 33 min; warm-cache compiles are seconds).
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)




def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False, help="run slow tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="need --slow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running tests gated behind --slow")
