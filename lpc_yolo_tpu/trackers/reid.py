"""ReID appearance encoder for BoT-SORT.

The reference leaves this unimplemented (`self.encoder = None`, "Haven't
supported BoT-SORT(reid) yet", reference trackers/bot_sort.py:158-160); this
module goes beyond it with two working encoders behind one callable
interface `encoder(img_bgr, boxes_xyxy) -> (N, D) float32`:

  * `hist`  (default): HSV color-histogram embedding — deterministic,
    training-free, and a classic appearance cue that meaningfully separates
    differently-colored objects. Runs on host (tiny).
  * `cnn`: a jitted 4-stage strided convnet over 128x64 crops with global
    average pooling -> 128-d embedding. Deterministically initialized; pass
    `params_path` (an .npz of the same tree) to load trained weights. All
    crops are embedded in ONE batched TPU call per frame.

Both L2-normalize, matching BOTrack.update_features' normalization.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

CROP_H, CROP_W = 128, 64


def _crop_resize(img: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Crop xyxy boxes from a BGR frame and resize to (CROP_H, CROP_W)."""
    import cv2

    h, w = img.shape[:2]
    out = np.zeros((len(boxes), CROP_H, CROP_W, 3), np.uint8)
    for i, (x1, y1, x2, y2) in enumerate(boxes[:, :4]):
        x1 = int(max(0, min(w - 1, x1)))
        x2 = int(max(x1 + 1, min(w, x2)))
        y1 = int(max(0, min(h - 1, y1)))
        y2 = int(max(y1 + 1, min(h, y2)))
        out[i] = cv2.resize(img[y1:y2, x1:x2], (CROP_W, CROP_H), interpolation=cv2.INTER_LINEAR)
    return out


class HistogramEncoder:
    """HSV color-histogram appearance embedding (8H x 8S x 4V = 256-d)."""

    def __init__(self, bins=(8, 8, 4)):
        self.bins = bins

    def __call__(self, img: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        import cv2

        if len(boxes) == 0:
            return np.zeros((0, int(np.prod(self.bins))), np.float32)
        crops = _crop_resize(img, np.asarray(boxes))
        feats = []
        for c in crops:
            hsv = cv2.cvtColor(c, cv2.COLOR_BGR2HSV)
            hist = cv2.calcHist([hsv], [0, 1, 2], None, list(self.bins), [0, 180, 0, 256, 0, 256])
            f = hist.reshape(-1).astype(np.float32)
            feats.append(f / (np.linalg.norm(f) + 1e-12))
        return np.stack(feats)


class CNNEncoder:
    """Jitted convnet embedder: (N,128,64,3) uint8 -> (N,128) unit vectors.

    One batched device call per frame; batch is padded to the next power of
    two to bound jit cache size.
    """

    def __init__(self, params_path: Optional[str] = None, embed_dim: int = 128):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        class _Net(nn.Module):
            dim: int

            @nn.compact
            def __call__(self, x):
                for i, c in enumerate((32, 64, 128, 128)):
                    x = nn.Conv(c, (3, 3), strides=(2, 2), name=f"conv{i}")(x)
                    x = nn.relu(nn.GroupNorm(num_groups=8, name=f"gn{i}")(x))
                x = jnp.mean(x, axis=(1, 2))
                return nn.Dense(self.dim, name="fc")(x)

        self._net = _Net(embed_dim)
        self._params = self._net.init(
            jax.random.PRNGKey(42), jnp.zeros((1, CROP_H, CROP_W, 3))
        )
        if params_path:
            loaded = dict(np.load(params_path))
            flat = jax.tree_util.tree_flatten_with_path(self._params)[0]
            treedef = jax.tree_util.tree_structure(self._params)
            leaves = []
            for path, leaf in flat:
                key = "/".join(str(getattr(p, "key", p)) for p in path)
                leaves.append(jnp.asarray(loaded[key]) if key in loaded else leaf)
            self._params = jax.tree_util.tree_unflatten(treedef, leaves)

        @jax.jit
        def _embed(params, crops_u8):
            x = crops_u8.astype(jnp.float32) / 255.0
            e = self._net.apply(params, x)
            return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)

        self._embed = _embed

    def __call__(self, img: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        if len(boxes) == 0:
            return np.zeros((0, 128), np.float32)
        crops = _crop_resize(img, np.asarray(boxes))
        n = len(crops)
        pad_n = 1 << (n - 1).bit_length()  # pad to pow2: bounded jit cache
        if pad_n != n:
            crops = np.concatenate([crops, np.zeros((pad_n - n, CROP_H, CROP_W, 3), np.uint8)])
        out = np.asarray(self._embed(self._params, jnp.asarray(crops)))
        return out[:n]


def build_encoder(kind: str = "hist", **kw):
    """Encoder factory for tracker configs (`reid_encoder: hist|cnn`)."""
    if kind in ("hist", "histogram"):
        return HistogramEncoder()
    if kind == "cnn":
        return CNNEncoder(**kw)
    raise ValueError(f"unknown reid encoder {kind!r} (use 'hist' or 'cnn')")
