"""Batch building + background prefetch loader.

Behavioral spec: reference ultralytics/data/build.py:29-124 (InfiniteDataLoader
+ seeded workers + distributed sampler). TPU-native re-design: a thread-pool
prefetcher producing fixed-shape numpy batches (uint8 NHWC images + padded gt
tensors) that the trainer ships to the device mesh; per-host sharding falls
out of slicing the index stream by jax.process_index() instead of a
DistributedSampler.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


def collate(samples) -> Dict[str, np.ndarray]:
    out = {"img": np.stack([s["img"] for s in samples])}
    for k in ("cls", "bboxes", "mask"):
        if k in samples[0]:
            out[k] = np.stack([s[k] for s in samples])
    if "masks" in samples[0]:
        out["masks"] = np.stack([s["masks"] for s in samples])
    if "label" in samples[0]:
        out["label"] = np.stack([s["label"] for s in samples])
    if "keypoints" in samples[0]:
        out["keypoints"] = np.stack([s["keypoints"] for s in samples])
    if "rboxes" in samples[0]:
        out["rboxes"] = np.stack([s["rboxes"] for s in samples])
    for k in ("orig_shape", "gain", "pad", "path"):
        if k in samples[0]:
            out[k] = [s[k] for s in samples]
    return out


class DataLoader:
    """Fixed-shape batch loader with background worker threads.

    Infinite when `infinite=True` (training, reshuffled each epoch like
    InfiniteDataLoader); one-pass otherwise (val: last batch padded by
    repeating the final sample so shapes stay static — extra rows carry
    `pad_count` for the consumer to drop).
    """

    def __init__(
        self,
        dataset,
        transforms,
        batch_size: int = 16,
        shuffle: bool = True,
        workers: int = 4,
        seed: int = 0,
        infinite: bool = False,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.transforms = transforms
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = max(workers, 1)
        self.seed = seed
        self.infinite = infinite
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count + (
            1 if len(self.dataset) % self.process_count > self.process_index else 0
        )
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(idx)
        return idx[self.process_index :: self.process_count]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch = self.epoch
        pool = ThreadPoolExecutor(max_workers=self.workers)
        try:
            while True:
                idx = self._indices(epoch)
                B = self.batch_size
                for start in range(0, len(idx), B):
                    chunk = list(idx[start : start + B])
                    pad_count = 0
                    if len(chunk) < B:
                        pad_count = B - len(chunk)
                        chunk = chunk + [chunk[-1]] * pad_count
                    rngs = [np.random.RandomState((self.seed + epoch) * 100003 + int(i)) for i in chunk]
                    samples = list(pool.map(lambda a: self.transforms(self.dataset, int(a[0]), a[1]), zip(chunk, rngs)))
                    batch = collate(samples)
                    batch["pad_count"] = pad_count
                    yield batch
                if not self.infinite:
                    return
                epoch += 1
                self.epoch = epoch
        finally:
            pool.shutdown(wait=False)
