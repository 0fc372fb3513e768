"""AugmentedCache: the host-starvation mitigation (data/shard_cache.py).

The chip consumes ~5x what a 1-core host can augment; the cache serves train
batches from a refreshing RAM window (bounded-staleness batch echoing) so
next(loader) never starves the device. Reference role: data/build.py:106
workers=8 per GPU — process-parallel augmentation the reference host had
cores for.
"""

import numpy as np
import pytest

from lpc_yolo_tpu.data import DataLoader, TrainTransforms, YOLODataset, check_det_dataset, make_synthetic_dataset
from lpc_yolo_tpu.data.shard_cache import AugmentedCache


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("cacheds")
    return make_synthetic_dataset(root / "ds", n_train=8, n_val=2, imgsz=96, nc=3)


def _loader(ds, batch=4):
    info = check_det_dataset(ds)
    dataset = YOLODataset(info["train"], imgsz=96, names=info["names"])
    return DataLoader(
        dataset, TrainTransforms(96, max_gt=16), batch_size=batch,
        workers=2, infinite=True,
    )


def test_cache_serves_valid_batches(ds):
    cache = AugmentedCache(_loader(ds), capacity=3, refresh=False)
    it = iter(cache)
    seen = [next(it) for _ in range(7)]
    for b in seen:
        assert b["img"].shape == (4, 96, 96, 3) and b["img"].dtype == np.uint8
        assert b["bboxes"].shape == (4, 16, 4)
    # frozen window of 3 slots: the 7 served batches come from <= 3 arrays
    ids = {id(b["img"]) for b in seen}
    assert len(ids) <= 3
    assert cache.served == 7 and cache.refreshed == 0


def test_cache_refresh_replaces_slots(ds):
    import time

    cache = AugmentedCache(_loader(ds), capacity=2, refresh=True)
    t0 = time.time()
    while cache.refreshed < 4 and time.time() - t0 < 30:
        time.sleep(0.05)
    cache.stop()
    assert cache.refreshed >= 4  # the background thread is producing


def test_cache_invalidate_refills(ds):
    cache = AugmentedCache(_loader(ds), capacity=2, refresh=False)
    before = [id(s["img"]) for s in cache._slots]
    cache.invalidate()
    after = [id(s["img"]) for s in cache._slots]
    assert set(before).isdisjoint(after)
    assert cache.refreshed == 2


def test_trainer_with_cache_augmented(ds, tmp_path):
    """End-to-end: 2-epoch train served from the cache; finite losses and
    the echo telemetry printed at the end. Uses the tiny test model — the
    full v10n's XLA:CPU train-step compile alone cost ~10 min of suite
    wall-clock here, and the cache path under test is model-agnostic."""
    from pathlib import Path

    from lpc_yolo_tpu import YOLO

    yolo = YOLO(Path(__file__).resolve().parent / "assets" / "tiny-v10.yaml", nc=3)
    res = yolo.train(
        data=str(ds), epochs=2, batch=4, imgsz=96, val=False, save=False,
        workers=2, cache_augmented=2, close_mosaic=1, save_dir=str(tmp_path),
    )
    assert res is not None
    csv = (tmp_path / "results.csv").read_text()
    assert "input_wait_frac" in csv
