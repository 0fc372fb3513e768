"""Torch SAM checkpoint -> flax variables for MobileSam.

Name mapping extends utils/torch_port conventions with SAM specifics:
  * 'layers.N.blocks.M' / 'layers.N.downsample' fuse into single linen scopes
    ('layers_N_blocks_M', 'layers_N_downsample') — the TinyViT stages are
    unrolled inline rather than nested module lists.
  * embedding-style weights (point_embeddings, iou_token, mask_tokens,
    not_a_point/no_mask) keep their (num, dim) shape (no Linear transpose).
  * ConvTranspose layers use flax transpose_kernel=True (torch semantics).
  * LayerNorm / LayerNorm2d 1-D 'weight' -> 'scale'.
  * the classifier head (norm_head/head) exists in the torch TinyViT but is
    unused by SAM's forward_features — skipped.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

_SKIP_PREFIXES = ("image_encoder.norm_head", "image_encoder.head")
_SKIP_SUFFIXES = ("num_batches_tracked", "attention_bias_idxs")
_EMBED_LEAF_PARENTS = (
    "point_embeddings_0", "point_embeddings_1", "point_embeddings_2", "point_embeddings_3",
    "not_a_point_embed", "no_mask_embed", "iou_token", "mask_tokens",
)


def _sam_path(name: str):
    comps = name.split(".")
    leaf = comps[-1]
    merged = []
    for c in comps[:-1]:
        if c.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{c}"
        else:
            merged.append(c)
    # fuse TinyViT stage scopes, the decoder MLPBlock, and the ViT patch embed
    fused = []
    for c in merged:
        if fused and (
            (fused[-1].startswith("layers_") and "_blocks" not in fused[-1] and c.startswith(("blocks_", "downsample")))
            or (c.startswith("lin") and fused[-1] == "mlp")
            or (c == "proj" and fused[-1] == "patch_embed")
        ):
            fused[-1] = f"{fused[-1]}_{c}"
        else:
            fused.append(c)
    return tuple(fused), leaf


def port_sam_state_dict(state_dict: Mapping[str, Any], variables: Dict[str, Any]) -> Dict[str, Any]:
    params = dict(flatten_dict(variables["params"]))
    stats = dict(flatten_dict(variables.get("batch_stats", {})))
    filled_p, filled_s = set(), set()

    for name, tensor in state_dict.items():
        if name.startswith(_SKIP_PREFIXES) or name.endswith(_SKIP_SUFFIXES):
            continue
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        path, leaf = _sam_path(name)

        if path and path[-1] == "bn":
            if leaf == "weight":
                key, tree, filled = path + ("scale",), params, filled_p
            elif leaf == "bias":
                key, tree, filled = path + ("bias",), params, filled_p
            elif leaf == "running_mean":
                key, tree, filled = path + ("mean",), stats, filled_s
            elif leaf == "running_var":
                key, tree, filled = path + ("var",), stats, filled_s
            else:
                raise KeyError(name)
        elif path and path[-1] in _EMBED_LEAF_PARENTS and leaf == "weight":
            key, tree, filled = path, params, filled_p  # raw (num, dim)
        elif leaf == "positional_encoding_gaussian_matrix":
            key, tree, filled = path + (leaf,), params, filled_p
        elif leaf == "attention_biases":
            key, tree, filled = path + (leaf,), params, filled_p
        elif leaf in ("pos_embed", "rel_pos_h", "rel_pos_w"):
            # ViT encoder raw parameters (encoders.py:77-80, :432-433)
            key, tree, filled = path + (leaf,), params, filled_p
        elif leaf == "weight" and arr.ndim == 4:
            key, tree, filled = path + ("kernel",), params, filled_p
            # OIHW -> HWIO; ConvTranspose2d (in,out,kh,kw) lands on the same
            # transpose because flax transpose_kernel=True expects (kh,kw,out,in)
            arr = arr.transpose(2, 3, 1, 0)
        elif leaf == "weight" and arr.ndim == 2:
            key, tree, filled = path + ("kernel",), params, filled_p
            arr = arr.transpose(1, 0)
        elif leaf == "weight" and arr.ndim == 1:
            key, tree, filled = path + ("scale",), params, filled_p  # LayerNorm(2d)
        elif leaf == "bias":
            key, tree, filled = path + ("bias",), params, filled_p
        else:
            raise KeyError(f"don't know how to port {name} (shape {arr.shape})")

        if key not in tree:
            raise KeyError(f"{name} -> {key} not present in flax variables")
        if tuple(tree[key].shape) != tuple(arr.shape):
            raise ValueError(f"shape mismatch {name} -> {key}: torch {arr.shape} vs flax {tree[key].shape}")
        tree[key] = jnp.asarray(arr, dtype=tree[key].dtype)
        filled.add(key)

    missing_p = set(params) - filled_p
    missing_s = set(stats) - filled_s
    if missing_p or missing_s:
        raise KeyError(
            f"unfilled flax entries: params={sorted(missing_p)[:6]} ({len(missing_p)}), "
            f"stats={sorted(missing_s)[:6]} ({len(missing_s)})"
        )
    out = {"params": unflatten_dict(params)}
    if stats:
        out["batch_stats"] = unflatten_dict(stats)
    return out


def load_torch_sam(path: str, net) -> Dict[str, Any]:
    """Load a mobile_sam.pt-style checkpoint and port onto `net`'s init tree."""
    import jax
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    elif isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "state_dict"):
        sd = sd["model"].state_dict()
    init = jax.jit(
        lambda: net.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1024, 1024, 3)),
            jnp.zeros((1, 8, 2)),
            -jnp.ones((1, 8), jnp.int32),
            jnp.zeros((1, 256, 256, 1)),
        )
    )()
    return port_sam_state_dict(sd, init)
