"""Streaming inference sources with background reader threads.

Behavioral spec: reference ultralytics/data/loaders.py:33-185 (LoadStreams:
per-source daemon reader threads with a frame buffer, vid_stride) and :186-250
(LoadScreenshots via mss). File/dir/ndarray/PIL sources live in
engine/predictor.load_source; these classes cover live sources.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from typing import Iterator, List, Optional, Tuple

import numpy as np


class LoadStreams:
    """Webcam / RTSP / video-URL streams: one daemon reader thread per source,
    yielding the freshest frame per source (stream_buffer=False semantics) or
    a FIFO (stream_buffer=True)."""

    def __init__(self, sources, vid_stride: int = 1, buffer: bool = False, max_buffer: int = 30):
        import cv2

        self.sources = [sources] if isinstance(sources, (str, int)) else list(sources)
        self.vid_stride = vid_stride
        self.buffer = buffer
        self.running = True
        self.caps: List = []
        self.queues: List[deque] = []
        self.threads: List[threading.Thread] = []
        self.fps: List[float] = []
        for i, s in enumerate(self.sources):
            cap = cv2.VideoCapture(int(s) if str(s).isnumeric() else s)
            if not cap.isOpened():
                raise ConnectionError(f"cannot open stream {s}")
            self.caps.append(cap)
            self.fps.append(cap.get(cv2.CAP_PROP_FPS) or 30.0)
            q: deque = deque(maxlen=max_buffer if buffer else 1)
            ok, frame = cap.read()
            if not ok:
                raise ConnectionError(f"cannot read from stream {s}")
            q.append(frame)
            self.queues.append(q)
            t = threading.Thread(target=self._reader, args=(i,), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i: int) -> None:
        n = 0
        cap = self.caps[i]
        while self.running and cap.isOpened():
            n += 1
            cap.grab()
            if n % self.vid_stride == 0:
                ok, frame = cap.retrieve()
                if not ok:
                    break
                self.queues[i].append(frame)
            time.sleep(0.0)
        self.running = False

    def __iter__(self) -> Iterator[Tuple[List[str], List[np.ndarray]]]:
        while self.running:
            frames = []
            for i, q in enumerate(self.queues):
                t0 = time.time()
                while not q and self.running and time.time() - t0 < 5:
                    time.sleep(1 / max(self.fps[i], 1))
                if not q:
                    self.close()
                    return
                frames.append(q.popleft() if self.buffer else q[-1].copy())
            yield [str(s) for s in self.sources], frames

    def close(self) -> None:
        self.running = False
        for t in self.threads:
            t.join(timeout=2)
        for cap in self.caps:
            cap.release()

    def __len__(self) -> int:
        return len(self.sources)


class LoadScreenshots:
    """Screen-capture source (reference loaders.py:186-250); requires `mss`."""

    def __init__(self, source: str = "screen 0", region: Optional[Tuple[int, int, int, int]] = None):
        try:
            import mss  # noqa: F401
        except ImportError as e:
            raise ImportError("LoadScreenshots requires the 'mss' package") from e
        import mss

        parts = str(source).split()
        self.screen = int(parts[1]) if len(parts) > 1 else 0
        self.sct = mss.mss()
        mon = self.sct.monitors[self.screen + 1]
        self.region = region or (mon["left"], mon["top"], mon["width"], mon["height"])

    def __iter__(self):
        left, top, w, h = self.region
        monitor = {"left": left, "top": top, "width": w, "height": h}
        while True:
            img = np.asarray(self.sct.grab(monitor))[..., :3]  # BGRA -> BGR
            yield ["screen"], [np.ascontiguousarray(img)]
