"""Pre-augmented batch cache with background refresh (host-starvation fix).

Why: one v5e chip consumes ~736 train img/s (v10n b32) while this 1-core host
augments ~139 img/s through the full decode+mosaic4+affine+HSV pipeline —
5.3 hosts' worth of augmentation per chip. The reference answers this with 8
dataloader worker PROCESSES per GPU (reference data/build.py:106); on a host
that simply lacks the cores, more workers cannot close a 5x gap.

TPU-native mitigation: augment once into a RAM-resident window of ready
batches, serve the chip from the window (a memcpy, never a starve), and keep
ONE background thread regenerating entries at whatever rate the host can
sustain. Each cached batch is therefore reused ~(chip_rate / host_rate) times
before being replaced — bounded-staleness batch echoing (Choi et al., "Faster
Neural Network Training with Data Echoing", 2019: repeating augmented batches
a few times costs little final accuracy and keeps the accelerator busy). The
echo factor is observable: `cache.echo_factor()` after training.

The window reshuffles every pass, and `invalidate()` synchronously refills it
(used at the close_mosaic boundary, where augmentation semantics change and
stale mosaic batches must not leak into the final epochs).
"""

from __future__ import annotations

import threading
from typing import Dict, Iterator, Optional

import numpy as np


class AugmentedCache:
    """Serve train batches from a refreshing RAM window over a real loader.

    Args:
        loader: an infinite augmenting DataLoader (data/build.py) — the cache
            consumes its iterator from one place only.
        capacity: number of batches held; RAM = capacity * batch_bytes
            (b32 @640 uint8 ~ 39 MB/batch).
        refresh: keep a daemon thread replacing entries round-robin at host
            speed. Off = a frozen window (tests / reproducibility).
        seed: window shuffle seed.
    """

    def __init__(self, loader, capacity: int = 16, refresh: bool = True, seed: int = 0):
        self.loader = loader
        self.capacity = max(int(capacity), 1)
        self.seed = seed
        self._src = iter(loader)
        self._src_lock = threading.Lock()  # the source iterator is not thread-safe
        self._slot_lock = threading.Lock()
        self._stop = threading.Event()
        self.served = 0
        self.refreshed = 0
        self._slots = [self._produce() for _ in range(self.capacity)]
        self._thread: Optional[threading.Thread] = None
        if refresh:
            self._thread = threading.Thread(
                target=self._refresh_loop, name="aug-cache-refresh", daemon=True
            )
            self._thread.start()

    def _produce(self) -> Dict[str, np.ndarray]:
        with self._src_lock:
            return next(self._src)

    def _refresh_loop(self) -> None:
        i = 0
        while not self._stop.is_set():
            try:
                batch = self._produce()
            except StopIteration:  # finite loader drained: freeze the window
                return
            with self._slot_lock:
                self._slots[i % self.capacity] = batch
            self.refreshed += 1
            i += 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed)
        while True:
            order = rng.permutation(self.capacity)
            for j in order:
                with self._slot_lock:
                    batch = self._slots[j]
                self.served += 1
                yield batch

    def invalidate(self) -> None:
        """Synchronously refill every slot (augmentation semantics changed,
        e.g. the close_mosaic boundary — reference trainer.py:354-356)."""
        for i in range(self.capacity):
            batch = self._produce()
            with self._slot_lock:
                self._slots[i] = batch
        self.refreshed += self.capacity

    def echo_factor(self) -> float:
        """Average number of times each served batch was reused (1.0 = every
        batch fresh; ~chip_rate/host_rate when the chip outruns the host)."""
        return self.served / max(self.capacity + self.refreshed, 1)

    def stop(self) -> None:
        self._stop.set()

    def __len__(self) -> int:
        return len(self.loader)
