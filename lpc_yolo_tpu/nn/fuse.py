"""Conv+BN fusion as a pure variables transform.

Behavioral spec: reference BaseModel.fuse() + fuse_conv_and_bn
(torch_utils.py:171-200): fold BN's affine+stats into the conv kernel for
inference. Here the fold keeps the variable-tree structure (BN becomes the
identity-with-bias: scale=1, mean=0, var=1-eps, bias=folded), so the same
module graph serves fused and unfused weights — XLA then folds the leftover
per-channel add into the conv epilogue.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from .modules import BN_EPS


def fuse_conv_bn(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Return new variables with every sibling (conv kernel, bn) pair folded."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p: Dict, s: Dict) -> Tuple[Dict, Dict]:
        new_p, new_s = {}, {}
        for k, v in p.items():
            if not isinstance(v, dict):
                new_p[k] = v
                continue
            if "bn" in v and "conv" in v and isinstance(v.get("conv"), dict) and "kernel" in v["conv"]:
                bn_p, bn_s = v["bn"], s[k]["bn"]
                gamma, beta = bn_p["scale"], bn_p["bias"]
                mean, var = bn_s["mean"], bn_s["var"]
                factor = gamma / jnp.sqrt(var + BN_EPS)  # (C,)
                kernel = v["conv"]["kernel"] * factor  # HWIO: broadcast over out-channel
                bias = beta - mean * factor
                sub_p = dict(v)
                sub_p["conv"] = {"kernel": kernel}
                sub_p["bn"] = {"scale": jnp.ones_like(gamma), "bias": bias}
                sub_s = dict(s[k])
                sub_s["bn"] = {"mean": jnp.zeros_like(mean), "var": jnp.full_like(var, 1.0 - BN_EPS)}
                # recurse into any other children alongside conv/bn
                for kk, vv in v.items():
                    if kk in ("conv", "bn"):
                        continue
                    if isinstance(vv, dict):
                        rp, rs = walk({kk: vv}, {kk: s[k].get(kk, {})})
                        sub_p[kk] = rp[kk]
                        if kk in rs:
                            sub_s[kk] = rs[kk]
                new_p[k] = sub_p
                new_s[k] = sub_s
            else:
                rp, rs = walk(v, s.get(k, {}))
                new_p[k] = rp
                if k in s:
                    new_s[k] = rs
        return new_p, new_s

    fp, fs = walk(params, stats)
    out = {"params": fp}
    if stats:
        out["batch_stats"] = fs
    return out


def fold_preprocess(variables, scale: float = 1.0 / 255.0, bgr: bool = False):
    """Fold input normalization (x*scale) and optional BGR->RGB flip into the
    FIRST conv's kernel: conv(x*s, W) == conv(x, W*s) and the channel flip is
    a kernel input-channel permutation. Callers then feed raw uint8-as-float
    frames with no elementwise preprocess — removing the normalize fusion and
    its ~1 ms layout copy from the serving step (profiled, v10n b32).

    Only valid when layer model_0 is a Conv consuming the raw image; callers
    gate on `model.specs[0].module == "Conv"`. Returns new variables; the
    input tree is unchanged.
    """
    import jax

    params = dict(variables["params"])
    m0 = {k: v for k, v in params["model_0"].items()}
    conv = dict(m0["conv"])
    k = conv["kernel"]
    if bgr:
        k = k[:, :, ::-1, :]
    conv["kernel"] = k * scale
    m0["conv"] = conv
    params["model_0"] = m0
    out = dict(variables)
    out["params"] = params
    return out
