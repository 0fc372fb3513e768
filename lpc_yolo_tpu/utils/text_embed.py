"""Text embeddings for YOLO-World `set_classes`.

The reference encodes class names with CLIP ViT-B/32 (nn/tasks.py:578-590
WorldModel.set_classes). CLIP weights are not downloadable in this
environment, so this module provides the same interface over a pluggable
encoder: pass real CLIP embeddings via the `embeddings=` argument when you
have them, or fall back to a deterministic hash-seeded unit-norm table — a
stand-in that exercises the full open-vocab compute path (text-guided
attention + contrastive logits) with reproducible vectors, NOT a semantic
text encoder.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

import numpy as np

EMBED_DIM = 512


def encode_names(names: Sequence[str], dim: int = EMBED_DIM, embeddings: Optional[np.ndarray] = None) -> np.ndarray:
    """(M, dim) L2-normalized embeddings, one per class name.

    embeddings: optional user-provided (M, dim) array (e.g. real CLIP text
    features); it is validated and L2-normalized. Otherwise each name gets a
    deterministic pseudo-random unit vector seeded by its SHA-256.
    """
    if embeddings is not None:
        e = np.asarray(embeddings, np.float32)
        if e.shape != (len(names), dim):
            raise ValueError(f"embeddings shape {e.shape} != ({len(names)}, {dim})")
    else:
        rows = []
        for n in names:
            seed = int.from_bytes(hashlib.sha256(n.encode()).digest()[:4], "little")
            rows.append(np.random.RandomState(seed).randn(dim).astype(np.float32))
        e = np.stack(rows)
    return e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
