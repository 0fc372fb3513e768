"""Port torch checkpoints (reference .pt state_dicts) into flax variables.

The module-name map is mechanical because the linen submodule names mirror the
torch attribute paths with numeric components merged ("cv2.0.1" -> "cv2_0_1").
Kernel layout: torch OIHW -> flax HWIO (transpose 2,3,1,0); grouped convs keep
the same rule. BN running stats land in the batch_stats collection.

Skipped torch entries: the frozen DFL arange conv (decoded analytically by
ops.anchors.dfl_expectation) and num_batches_tracked counters.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

_SKIP_SUFFIXES = ("num_batches_tracked",)
_SKIP_EXACT_TAILS = ("dfl.conv.weight",)


def torch_path_to_flax(name: str) -> Tuple[Tuple[str, ...], str]:
    """'model.23.cv2.0.1.conv.weight' -> (('model_23','cv2_0_1','conv'), 'weight')."""
    comps = name.split(".")
    leaf = comps[-1]
    merged = []
    for c in comps[:-1]:
        if c.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{c}"
        else:
            merged.append(c)
    return tuple(merged), leaf


def port_state_dict(
    state_dict: Mapping[str, Any],
    variables: Dict[str, Any],
    strict: bool = True,
) -> Dict[str, Any]:
    """Map a torch state_dict onto existing flax `variables` (params+batch_stats).

    Args:
        state_dict: torch name -> tensor (or numpy array).
        variables: flax variables dict from model.init — provides the expected
            tree structure and shapes.
        strict: raise if any flax param is left unfilled or shapes mismatch.
    """
    params = dict(flatten_dict(variables["params"]))
    stats = dict(flatten_dict(variables.get("batch_stats", {})))
    filled_p, filled_s = set(), set()

    for name, tensor in state_dict.items():
        if name.endswith(_SKIP_SUFFIXES) or any(name.endswith(t) for t in _SKIP_EXACT_TAILS):
            continue
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        path, leaf = torch_path_to_flax(name)

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
                raise KeyError(f"unexpected bn leaf {name}")
        elif leaf == "weight" and arr.ndim == 4:
            key, tree, filled = path + ("kernel",), params, filled_p
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif leaf == "weight" and arr.ndim == 2:
            key, tree, filled = path + ("kernel",), params, filled_p
            arr = arr.transpose(1, 0)  # torch Linear (out,in) -> flax (in,out)
        elif leaf == "bias":
            key, tree, filled = path + ("bias",), params, filled_p
        else:
            if strict:
                raise KeyError(f"don't know how to port {name} (shape {arr.shape})")
            continue

        if key not in tree:
            if strict:
                raise KeyError(f"{name} -> {key} not present in flax variables")
            continue
        expect = tree[key].shape
        if tuple(expect) != tuple(arr.shape):
            raise ValueError(f"shape mismatch for {name} -> {key}: torch {arr.shape} vs flax {expect}")
        tree[key] = jnp.asarray(arr, dtype=tree[key].dtype)
        filled.add(key)

    if strict:
        missing_p = set(params) - filled_p
        missing_s = set(stats) - filled_s
        if missing_p or missing_s:
            raise KeyError(
                f"unfilled flax entries: params={sorted(missing_p)[:8]}... "
                f"({len(missing_p)}), stats={sorted(missing_s)[:8]}... ({len(missing_s)})"
            )

    out = {"params": unflatten_dict(params)}
    if stats:
        out["batch_stats"] = unflatten_dict(stats)
    return out
