"""YAML -> model-graph compiler and the DetectionModel linen module.

Behavioral spec: reference ultralytics/nn/tasks.py:826-1107 (parse_model,
yaml_model_load, guess_model_scale) and :260-300 (DetectionModel with stride
probe). Same YAML schema: `backbone` + `head` lists of
[from, repeats, module, args], `scales: {letter: [depth, width, max_channels]}`.

TPU-first differences from the reference:
  * compile-time channel inference produces a static LayerSpec tuple; the
    linen module's __call__ unrolls it, so the whole graph is one XLA program
    (the reference interprets an nn.Sequential layer list per call).
  * strides are probed with jax.eval_shape (zero FLOPs) instead of a real
    dummy forward.
  * decode is a pure function appended to the graph under the same jit.
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import yaml
from flax import linen as nn

from . import modules as M
from . import quant as quant_lib  # aliased: DetectionModel.quant is a field name
from . import research as R
from .transformer import RTDETRDecoder
from .heads import (
    OBB,
    Classify,
    Detect,
    Pose,
    Segment,
    V10Detect,
    decode_feats,
    decode_feats_obb,
    decode_feats_topk,
    decode_kpts,
)

# Modules whose YAML arg[0] is the (width-scaled) output-channel count.
_BASE = {
    "Conv",
    "DWConv",
    "GhostConv",
    "Focus",
    "Bottleneck",
    "SPPF",
    "C2f",
    "C3",
    "PSA",
    "SCDown",
    "C2fCIB",
    "C2f_SPCA",
    "LPC",
    "RepNCSPELAN4",
    "ADown",
    "SPPELAN",
    "C2fAttn",
    "SPP",
    "C1",
    "C2",
    "C3x",
    "C3TR",
    "C3Ghost",
    "GhostBottleneck",
    "BottleneckCSP",
    "RepC3",
    "ConvTranspose",
    "LightConv",
    "RepConv",
}
# Base modules that additionally receive the (depth-scaled) repeat count.
_REPEAT = {
    "C2f", "C3", "C2fCIB", "C2f_SPCA", "C2fAttn",
    "C1", "C2", "C3x", "C3TR", "C3Ghost", "BottleneckCSP", "RepC3",
}

_HEADS = {"Detect", "v10Detect", "Segment", "Pose", "OBB", "RTDETRDecoder", "WorldDetect"}


def make_divisible(x: float, divisor: int = 8) -> int:
    import math

    return math.ceil(x / divisor) * divisor


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """One compiled graph node: routing + module + resolved static args."""

    i: int
    f: Tuple[int, ...]  # 'from' indices (-1 = previous); singleton for unary
    n: int  # resolved repeat count
    module: str
    args: Tuple[Any, ...]  # resolved ctor args (post channel inference)
    c2: int  # output channels (bookkeeping)


def guess_model_scale(path: Union[str, Path]) -> str:
    m = re.search(r"yolov\d+([nsmblx])", Path(path).stem)
    return m.group(1) if m else ""


def yaml_model_load(path: Union[str, Path]) -> Dict:
    """Load a model YAML, recording inferred scale (tasks.py:1069-1107)."""
    path = Path(path)
    d = yaml.safe_load(path.read_text())
    d["scale"] = d.get("scale") or guess_model_scale(path)
    d["yaml_file"] = str(path)
    return d


def parse_model(d: Dict, ch: int = 3) -> Tuple[Tuple[LayerSpec, ...], Tuple[int, ...]]:
    """Compile the YAML dict into LayerSpecs with resolved channels.

    Mirrors the reference's channel-inference registry (tasks.py:826-1067) for
    the supported module set; unknown modules raise.
    """
    nc = d["nc"]
    # legacy flat multipliers (v3/v5-era YAMLs) — reference tasks.py:841-848
    depth = d.get("depth_multiple", 1.0)
    width = d.get("width_multiple", 1.0)
    max_channels = float("inf")
    scales = d.get("scales")
    if scales:
        scale = d.get("scale") or tuple(scales.keys())[0]
        if scale not in scales:
            scale = tuple(scales.keys())[0]
        depth, width, max_channels = scales[scale]

    chs: List[int] = [ch]
    specs: List[LayerSpec] = []
    save: List[int] = []

    for i, (f, n, m, args) in enumerate(d["backbone"] + d["head"]):
        args = [
            nc if a == "nc" else (tuple(d["kpt_shape"]) if a == "kpt_shape" else a)
            for a in list(args)
        ]
        n_res = max(round(n * depth), 1) if n > 1 else n
        f_list = [f] if isinstance(f, int) else list(f)
        # normalize negative routing indices other than -1 (e.g. rt-detr's
        # [[-2, -1], Concat]) to absolute layer indices; -1 stays relative
        f_list = [x if x == -1 or x >= 0 else x + i for x in f_list]

        if m in _BASE:
            c1, c2 = chs[f_list[0]], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            if m == "C2fAttn":  # embed channels + heads scaling (tasks.py:902-906)
                args[1] = make_divisible(min(args[1], max_channels // 2) * width, 8)
                args[2] = int(
                    max(round(min(args[2], max_channels // 2 // 32)) * width, 1) if args[2] > 1 else args[2]
                )
            out_args = [c1, c2, *args[1:]]
            if m in _REPEAT:
                out_args.insert(2, n_res)
                n_res = 1
        elif m == "Concat":
            c2 = sum(chs[x] for x in f_list)
            out_args = list(args)
        elif m == "AIFI":
            # reference tasks.py:916: args = [ch[f], *args]; channels preserved
            c1 = chs[f_list[0]]
            out_args = [c1, *args]
            c2 = c1
        elif m in ("HGStem", "HGBlock"):
            # reference tasks.py:918-923: [c1, cm, c2, *rest]; HGBlock gets n
            c1, cm, c2 = chs[f_list[0]], args[0], args[1]
            out_args = [c1, cm, c2, *args[2:]]
            if m == "HGBlock":
                out_args.insert(4, n_res)
                n_res = 1
        elif m == "ResNetLayer":
            # reference tasks.py:924-925: args pass through unscaled;
            # c2 = planes (is_first) or 4*planes (bottleneck expansion)
            c2 = args[1] if args[3] else args[1] * 4
            out_args = list(args)
        elif m in _HEADS:
            out_args = list(args)
            if m == "Segment":  # scale npr by width (tasks.py:936)
                out_args[2] = make_divisible(min(out_args[2], max_channels) * width, 8)
            out_args = [*out_args, tuple(chs[x] for x in f_list)]
            c2 = chs[f_list[-1]]
        elif m == "CBAM":
            # Reference routes CBAM through the attention-registry branch
            # (tasks.py:1017): args = [c1, *yaml_args] (yaml arg = ratio).
            c1 = chs[f_list[0]]
            out_args = [c1, *args]
            c2 = c1
        elif m == "SPCA":
            c1 = chs[f_list[0]]
            out_args = [c1]
            c2 = c1
        elif m == "space_to_depth":
            c2 = 4 * chs[f_list[0]]
            out_args = list(args)
        elif m == "SPDConv":
            # Sane rule (the reference's own bookkeeping for SPDConv is
            # inconsistent and unused by any shipped YAML): args = [c2, k],
            # width-scaled like base modules.
            c1, c2 = chs[f_list[0]], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            out_args = [c1, c2, *args[1:]]
        elif m == "Classify":
            c1, c2 = chs[f_list[0]], args[0]
            out_args = [c1, c2, *args[1:]]
        elif m == "nn.Upsample":
            c2 = chs[f_list[0]]
            out_args = list(args)
        elif m in ("nn.MaxPool2d", "nn.ZeroPad2d"):
            c2 = chs[f_list[0]]
            out_args = list(args)
        elif m == "nn.ConvTranspose2d":
            # width-scaled like base modules (reference tasks.py base set)
            c1, c2 = chs[f_list[0]], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            out_args = [c1, c2, *args[1:]]
        elif m == "Silence":
            c2 = chs[f_list[0]]
            out_args = []
        elif m == "CBLinear":
            # c2 is a channel list; stored as the layer's "channels" for
            # bookkeeping only (consumed exclusively by CBFuse via indices)
            c1 = chs[f_list[0]]
            c2 = tuple(args[0])
            out_args = [c1, c2, *args[1:]]
        elif m == "CBFuse":
            c2 = chs[f_list[-1]]
            out_args = [tuple(args[0])]
        elif m == "ImagePoolingAttn":
            # reference routes this through the heads arg-branch (tasks.py:932)
            out_args = [*args, tuple(chs[x] for x in f_list)]
            c2 = chs[f_list[-1]]
        elif m in ("ASFF2", "ASFF3"):
            # c1 is the channel list of the fused levels; output channels are
            # the level-selected inter_dim (reference block.py:4651,4693)
            c1l = [chs[x] for x in f_list]
            level = args[1] if len(args) > 1 else 0
            c2 = make_divisible(min(args[0], max_channels) * width, 8)
            out_args = [tuple(c1l), c2, level]
            c2 = c1l[level]
        elif m in R.WIDTH_SCALED:
            c1, c2 = chs[f_list[0]], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            out_args = [c1, c2, *args[1:]]
            if m in ("InvertedBottleneck", "MobileNetV3_BLOCK") and len(out_args) > 3 and isinstance(out_args[3], int):
                out_args[3] = make_divisible(min(out_args[3], max_channels) * width, 8)
            if m in R.WIDTH_REPEAT:
                out_args.insert(2, n_res)
                n_res = 1
        elif m in R.C1_PREPEND:
            c1 = chs[f_list[0]]
            out_args = [c1, *args]
            c2 = c1
            if m == "StarBlock":  # repeats fold into the module (tasks.py:975)
                out_args = [c1, args[0] if args else 3, n_res]
                n_res = 1
        elif m in R.C1_ONLY:
            c1 = chs[f_list[0]]
            out_args = [c1]
            c2 = c1
        elif m in R.PASSTHROUGH:
            c2 = chs[f_list[0]]
            out_args = list(args)
        else:
            raise NotImplementedError(f"module '{m}' not supported by the TPU compiler yet (layer {i})")

        specs.append(LayerSpec(i, tuple(f_list), n_res, m, tuple(_hashable(a) for a in out_args), c2))
        save.extend(x % i for x in f_list if x != -1)
        if i == 0:
            chs = []
        chs.append(c2)

    return tuple(specs), tuple(sorted(set(save)))


def _hashable(a):
    if isinstance(a, list):
        return tuple(a)
    return a


def _pack_of(c2: int) -> int:
    """Width-pack factor for a channel count: smallest power-of-two P with
    P*c2 >= 96 lanes, applied only for c2 <= 64. 0 = leave unpacked.

    TPU tiles put channels on the 128-wide lane axis, so low-C activations
    waste HBM bandwidth and MXU columns; packing P width-adjacent pixels
    into the channel axis makes lanes dense at a kernel-expansion FLOP cost
    of ~P x (modules.packed_conv — the scattered kernel is 1/P-dense and the
    MXU computes the zeros). The xplane-profiled break-even on v5e: XLA's
    in-context conv efficiency is ~64% of the lane-util ceiling (e.g. 48%
    of peak for unpacked 96-ch 3x3 convs, fusion-measured on v10m), while
    packed convs run at 60-94% of peak hardware rate. Packing therefore
    wins only while C/128 * 0.64 < 0.85/P, i.e. for C <= 64; the previous
    exact-multiple rule (P = 128/gcd(C,128)) packed v10m's 48/96-channel
    stem at P=8/P=4 and cost ~12 ms of a 36.6 ms step for 326 GF of
    logical work — re-tuned here to [96,128]-lane targets.
    """
    if not isinstance(c2, int) or c2 <= 0 or c2 > 64:
        return 0
    p = 1
    while p * c2 < 96:
        p *= 2
    return p if p > 1 else 0


def _s2d_fuse_plan(specs, save) -> Dict[int, int]:
    """Serving-graph space_to_depth fold sites: {consumer_i: s2d_i}.

    Matches `space_to_depth` -> Conv/C2f(-1) pairs where the s2d output has
    no other consumers. The s2d is a pure layout op (4x channel, 1/2 spatial
    strided-slice concat, reference block.py:4063); folding it into the next
    conv's kernel (modules.s2d_fold_kernel: 1x1 -> 2x2 stride-2, kxk ->
    2kx2k stride-2) deletes the relayout traffic entirely and keeps the
    width-pack chain unbroken across the LPC backbone's stage boundaries.
    """
    plan: Dict[int, int] = {}
    for k in range(len(specs) - 1):
        a, b = specs[k], specs[k + 1]
        if a.module != "space_to_depth" or a.f != (-1,) or a.i in save:
            continue
        if b.f != (-1,) or b.n != 1:
            continue
        if b.module == "Conv":
            # same constraints as the ConvBN fold: 'same' padding, no
            # groups/dilation (mirrors the packed-conv gating)
            if len(b.args) > 4 and b.args[4] not in (None, "None"):
                continue
            if len(b.args) > 5 and b.args[5] != 1:
                continue
            if len(b.args) > 6 and b.args[6] != 1:
                continue
            plan[b.i] = a.i
        elif b.module == "C2f" and (len(b.args) <= 4 or b.args[4] == 1):
            plan[b.i] = a.i
    return plan


def _wpack_out(spec: LayerSpec, p_in: int, fold_s2d: bool = False,
               dense_only: bool = False,
               deploy_graph: bool = False) -> Optional[Tuple[int, int]]:
    """Pack plan for a layer given the arriving pack factor.

    Returns (p_in_used, p_out), or None to run unpacked. Repacking between
    factors is a free reshape (modules.repack_width), so an incompatible
    arrival pack is never a blocker — the layer asks for the factor it wants.
    Conv: direct P_in->P_out when the packed stride is integral
    (s*P_out % P_in == 0), else repack-on-entry. C2f: uniform pack (deploy
    rewrite only, n<=2 gate matching _build_module), pack-on-entry from
    unpacked inputs.

    dense_only (batch >= 96): pack only where the packed lanes land EXACTLY
    on one 128-lane tile. At large batch the row dimension already tiles the
    MXU well, so 96-lane targets (c2=48 P2) and >128-lane bloat (48ch stem
    at P8 = 384 lanes) lose to their FLOP overhead, while exact-128 packing
    (16/32/64ch) still wins. Measured v10m b128: 1282 img/s fully unpacked
    vs 1192 on the b32 plan; v10n b128: 5582 on the b32 plan vs 5276
    unpacked — the split keeps both winners.
    """
    if spec.module not in ("Conv", "C2f") or len(spec.f) != 1:
        return None
    p_out = _pack_of(spec.c2)
    if dense_only and p_out and p_out * spec.c2 != 128:
        p_out = 0
    if spec.module == "Conv":
        s = spec.args[3] if len(spec.args) > 3 else 1
        if fold_s2d:
            s = 2 * s  # folded conv runs at 2x stride on the pre-s2d map
        if len(spec.args) > 4 and spec.args[4] not in (None, "None"):
            return None  # explicit padding: packed_conv assumes 'same'
        if len(spec.args) > 5 and spec.args[5] != 1:
            return None  # grouped convs not packed
        if len(spec.args) > 6 and spec.args[6] != 1:
            return None  # dilation not packed
        # image-stem feed (c1 < 16): the arriving pack IS the MXU contraction
        # density (K = kh*kwp*P_in*c1); repacking down (or unpacking) would
        # starve K (a 3-ch input at P=2 gives K=54), so when the direct
        # chain (s*P_out % P_in == 0) is unavailable continue at P_in/s and
        # let the next layer decide
        c1 = spec.args[0] // 4 if fold_s2d else spec.args[0]
        stem_feed = (
            p_in > 1
            and isinstance(c1, int)
            and c1 < 16
            and p_in % s == 0
            and p_in // s >= 2
        )
        if dense_only and p_in * spec.c2 > 128:
            # large-batch: the (p_in, p_in) stem override would over-bloat
            # (48ch at P8 = 384 lanes); fall through to the ending paths
            stem_feed = False
        if stem_feed and (not p_out or (s * p_out) % p_in != 0):
            # keep P_out = P_in when no direct chain exists: both the
            # contraction (K = kh*kwp*P_in*c1) and the output lanes
            # (P_out*c2) stay multi-tile dense. Profiled v10m L0:
            # (8,8) = 0.80 ms vs (8,4) = 2.24 ms — the (8,4) kernel tiles
            # at K=144/N=192 and loses 3x to pad waste.
            return (p_in, p_in)
        if not p_out:
            # chain continuation at a stage boundary: a stride-2 conv fed
            # packed keeps consuming the packed input. When halving the pack
            # stays 128-dense, emit P_in/2; otherwise repack (free) to P=2
            # and emit UNPACKED (P_out=1, kernel bloat only 4/3) — the
            # packed region then ends inside the conv, with no separate
            # unpack relayout and no low-lane plain conv. (xplane-profiled
            # on v10m: unpack-then-plain for the 48ch 320^2 stem cost
            # ~3 ms more per step than ending the chain in-conv.)
            if p_in > 1 and s == 2:
                lanes = spec.c2 * (p_in // 2)
                dense = lanes == 128 if dense_only else lanes % 128 == 0
                if p_in % 2 == 0 and p_in // 2 >= 2 and dense:
                    return (p_in, p_in // 2)
                return (2, 1)
            return None
        if p_in > 1 and (s * p_out) % p_in == 0:
            return (p_in, p_out)
        if stem_feed:
            return (p_in, p_in // s)
        return (p_out if p_in > 1 else 1, p_out)
    # C2f: the pack applies to cv1's output y (c2 channels) and the
    # bottleneck interiors (c2/2); target >= 128 lanes on y, i.e. >= 64 on
    # the interiors (c2=96 -> P2, 64 -> P2, 32 -> P4). At c2 > 128 y is
    # already lane-dense and the interior bloat is a wash — run unpacked.
    #
    # c2 == 128 (deploy serving graph only): y is dense but the hidden-c=64
    # bottleneck interiors tile at 45% fill (3x3 64->64: K=576->640, N=64
    # ->128). Packing P=2 lands the interiors EXACTLY dense (128 lanes) at
    # a 4/3 kernel-expansion cost — lane_fill.py puts these sites at 8% of
    # v10l's FLOPs, and the packed-plain rewrite is linear in n, so the
    # n<=2 gate (an O(n^2) plain-rewrite artifact) doesn't apply. Kept off
    # the train_pack plan — MEASURED ON-CHIP (round 4): extending it to
    # training took v10n b32 from 715 to 686 img/s (+10% step GFLOPs): the
    # training structure pays the packed 1x1 cv1/cv2 kernels' P-fold FLOP
    # bloat in fwd AND both bwd passes, which outweighs the interiors' fill
    # gain once BN folding isn't available to absorb it.
    n_blocks = spec.args[2] if len(spec.args) > 2 else 1
    if spec.c2 == 128 and deploy_graph:
        p_out = 2
    elif spec.c2 >= 128 or n_blocks > 2:
        # n<=2 must match the deploy-C2f gate in _build_module
        return None
    else:
        p_out = 1
        while p_out * spec.c2 < 128:
            p_out *= 2
    if p_out <= 1 or (dense_only and p_out * spec.c2 != 128):
        return None
    if fold_s2d:
        # folded cv1 runs at stride 2: the packed form needs
        # (2 * p_out) % p_used == 0 — all factors are powers of two, so the
        # largest usable arrival pack is min(p_in, 2 * p_out)
        p_used = min(p_in, 2 * p_out) if p_in > 1 else 1
        return (p_used, p_out)
    return (p_out if p_in > 1 else 1, p_out)


def _up_fusion_plan(specs, save) -> Dict[int, Tuple[int, int, int]]:
    """Serving-graph upsample-commute sites: {c2f_i: (up_i, concat_i, skip_j)}.

    Matches the FPN-neck triple `nn.Upsample(2x, nearest)` -> `Concat([-1, j])`
    -> `C2f(-1)` where the upsample/concat outputs have no other consumers.
    cv1 is 1x1, so its upsampled-input rows commute through the nearest
    upsample (modules.C2f up_pair path): the conv runs on the 4x-smaller map
    and the 2x repeat moves after it. Only plain-path C2f blocks (no deploy
    rewrite claim, i.e. c2 > 128 or n > 2) are planned — the rewrite path
    has its own input handling.
    """
    plan: Dict[int, Tuple[int, int, int]] = {}
    for k in range(len(specs) - 2):
        s_up, s_cat, s_c2f = specs[k], specs[k + 1], specs[k + 2]
        if s_up.module != "nn.Upsample" or s_cat.module != "Concat" or s_c2f.module != "C2f":
            continue
        if len(s_up.args) < 3 or s_up.args[1] != 2 or str(s_up.args[2]) != "nearest":
            continue
        if s_up.f != (-1,) or s_c2f.f != (-1,):
            continue
        if len(s_cat.f) != 2 or s_cat.f[0] != -1 or s_cat.f[1] == -1:
            continue
        if s_up.i in save or s_cat.i in save:
            continue
        if s_c2f.args[1] <= 128 and s_c2f.args[2] <= 2:
            continue  # deploy-rewrite C2f: handled by _deploy_call instead
        plan[s_c2f.i] = (s_up.i, s_cat.i, s_cat.f[1])
    return plan


def _repack(x, p_from: int, p_to: int):
    """Pack-factor change on the serving path.

    Logically a pure reshape (modules.repack_width), but XLA compiles the
    lane-dim change to a generic transpose copy at ~1/6 of HBM bandwidth
    (1.23 ms for the v10m stem's 4->2, xplane-profiled); on TPU backends the
    relayout streams through a Pallas kernel instead. Down-repacks only
    (p_to | p_from, incl. unpack p_to=1); CPU and pack-up fall back to the
    reshape.
    """
    if p_from == p_to:
        return x
    # NOTE: a Pallas relayout kernel (ops/pallas_layout.py) was benched against
    # XLA's compiled copy for the v10m stem's 4->2: XLA reaches ~290 GB/s,
    # the slice-copy kernel only ~184 GB/s (lane slices at 1.5-tile offsets
    # lower to shuffle chains), so the plain reshape path stays.
    return M.repack_width(x, p_from, p_to) if p_to > 1 else M.unpack_width(x, p_from)


def _build_module(spec: LayerSpec, dtype, name: str, deploy: bool = False,
                  pack_in: int = 1, pack_out: int = 1, s2d_in: bool = False):
    """Instantiate the linen module for a compiled LayerSpec."""
    m, a = spec.module, spec.args
    if m == "Conv":
        c1, c2 = a[0], a[1]
        k = a[2] if len(a) > 2 else 1
        s = a[3] if len(a) > 3 else 1
        p = a[4] if len(a) > 4 and a[4] not in (None, "None") else None
        g = a[5] if len(a) > 5 else 1
        d = a[6] if len(a) > 6 else 1
        act = "silu" if (len(a) <= 7 or a[7] is True) else (a[7] or False)
        return M.ConvBN(
            c2, k, s, p=p, g=g, d=d, act=act,
            pack_in=pack_in, pack_out=pack_out, s2d_in=s2d_in, dtype=dtype, name=name,
        )
    if m == "DWConv":
        import math as _math

        c1, c2 = a[0], a[1]
        k = a[2] if len(a) > 2 else 1
        s = a[3] if len(a) > 3 else 1
        d = a[4] if len(a) > 4 else 1
        act = "silu" if (len(a) <= 5 or a[5] is True) else (a[5] or False)
        return M.ConvBN(c2, k, s, g=_math.gcd(c1, c2), d=d, act=act, dtype=dtype, name=name)
    if m == "GhostConv":
        return M.GhostConv(a[1], a[2] if len(a) > 2 else 1, a[3] if len(a) > 3 else 1, dtype=dtype, name=name)
    if m == "Focus":
        return M.Focus(a[1], a[2] if len(a) > 2 else 1, dtype=dtype, name=name)
    if m == "Bottleneck":
        return M.Bottleneck(a[1], *(a[2:]), dtype=dtype, name=name)
    if m == "SPPF":
        return M.SPPF(a[1], a[2] if len(a) > 2 else 5, dtype=dtype, name=name)
    if m == "C2f":
        # The slice/concat-free rewrite expands shortcut blocks into O(n^2)
        # convs — a win only in the lane-padded low-channel regime, where
        # slice/concat copies dominate. Measured v10m b32: 706 img/s applied
        # everywhere, 792 gated at (C<=64 or n<=2), 824 plain; v10n b32
        # (all C2f at C<=128, n<=2): +21% from the rewrite.
        # n <= 2 gates only the O(n^2) plain rewrite; the packed-plain form
        # (pack_out > 1, _deploy_call_packed) is linear in n
        dep = deploy and a[1] <= 128 and (a[2] <= 2 or pack_out > 1)
        return M.C2f(
            a[1], n=a[2], shortcut=a[3] if len(a) > 3 else False,
            deploy=dep, pack=pack_out, pack_in=pack_in if pack_out > 1 else 1,
            s2d_in=s2d_in, dtype=dtype, name=name,
        )
    if m == "C3":
        return M.C3(a[1], n=a[2], shortcut=a[3] if len(a) > 3 else True, dtype=dtype, name=name)
    if m == "PSA":
        return M.PSA(a[1], dtype=dtype, name=name)
    if m == "SCDown":
        return M.SCDown(a[1], a[2], a[3], dtype=dtype, name=name)
    if m == "C2fCIB":
        return M.C2fCIB(
            a[1],
            n=a[2],
            shortcut=a[3] if len(a) > 3 else False,
            lk=a[4] if len(a) > 4 else False,
            dtype=dtype,
            name=name,
        )
    if m == "C2f_SPCA":
        return M.C2fSPCA(a[1], n=a[2], shortcut=a[3] if len(a) > 3 else False, dtype=dtype, name=name)
    if m == "LPC":
        return M.LPC(a[1], a[2] if len(a) > 2 else 1, a[3] if len(a) > 3 else 1, dtype=dtype, name=name)
    if m == "CBAM":
        return M.CBAM(kernel_size=a[1] if len(a) > 1 else 7, dtype=dtype, name=name)
    if m == "SPCA":
        return M.SPCA(dtype=dtype, name=name)
    if m == "space_to_depth":
        return M.SpaceToDepth(name=name)
    if m == "SPDConv":
        return M.SPDConv(a[1], a[2] if len(a) > 2 else 1, dtype=dtype, name=name)
    if m == "nn.Upsample":
        return M.Upsample(scale=int(a[1]), name=name)
    if m == "nn.MaxPool2d":
        return M.MaxPool2d(a[0], a[1] if len(a) > 1 else a[0], a[2] if len(a) > 2 else 0, name=name)
    if m == "nn.ZeroPad2d":
        return M.ZeroPad2d(tuple(a[0]), name=name)
    if m == "nn.ConvTranspose2d":
        # raw torch ConvTranspose2d: bias, no BN, no activation
        return M.ConvTransposeBN(
            a[1], a[2] if len(a) > 2 else 2, a[3] if len(a) > 3 else 2,
            a[4] if len(a) > 4 else 0, use_bn=False, act=False, dtype=dtype, name=name,
        )
    if m == "Concat":
        return M.Concat(name=name)
    if m == "RepNCSPELAN4":
        return M.RepNCSPELAN4(a[1], a[2], a[3], a[4] if len(a) > 4 else 1, dtype=dtype, name=name)
    if m == "ADown":
        return M.ADown(a[1], dtype=dtype, name=name)
    if m == "SPPELAN":
        return M.SPPELAN(a[1], a[2], a[3] if len(a) > 3 else 5, dtype=dtype, name=name)
    if m == "Silence":
        return M.Silence(name=name)
    if m == "CBLinear":
        return M.CBLinear(tuple(a[1]), a[2] if len(a) > 2 else 1, a[3] if len(a) > 3 else 1, dtype=dtype, name=name)
    if m == "CBFuse":
        return M.CBFuse(tuple(a[0]), name=name)
    if m == "C2fAttn":
        return M.C2fAttn(
            a[1], n=a[2], ec=a[3], nh=a[4] if len(a) > 4 else 1,
            gc=a[5] if len(a) > 5 else 512, dtype=dtype, name=name,
        )
    if m == "SPP":
        return M.SPP(a[1], tuple(a[2]) if len(a) > 2 else (5, 9, 13), dtype=dtype, name=name)
    if m == "C1":
        return M.C1(a[1], n=a[2] if len(a) > 2 else 1, dtype=dtype, name=name)
    if m == "C2":
        return M.C2(a[1], n=a[2], shortcut=a[3] if len(a) > 3 else True, dtype=dtype, name=name)
    if m == "C3x":
        return M.C3x(a[1], n=a[2], shortcut=a[3] if len(a) > 3 else True, dtype=dtype, name=name)
    if m == "C3TR":
        return M.C3TR(a[1], n=a[2], shortcut=a[3] if len(a) > 3 else True, dtype=dtype, name=name)
    if m == "C3Ghost":
        return M.C3Ghost(a[1], n=a[2], shortcut=a[3] if len(a) > 3 else True, dtype=dtype, name=name)
    if m == "GhostBottleneck":
        return M.GhostBottleneck(a[1], a[2] if len(a) > 2 else 3, a[3] if len(a) > 3 else 1, dtype=dtype, name=name)
    if m == "BottleneckCSP":
        return M.BottleneckCSP(a[1], n=a[2], shortcut=a[3] if len(a) > 3 else True, dtype=dtype, name=name)
    if m == "RepC3":
        return M.RepC3(a[1], n=a[2], e=a[3] if len(a) > 3 else 1.0, dtype=dtype, name=name)
    if m == "ConvTranspose":
        return M.ConvTransposeBN(
            a[1], a[2] if len(a) > 2 else 2, a[3] if len(a) > 3 else 2,
            a[4] if len(a) > 4 else 0, dtype=dtype, name=name,
        )
    if m == "LightConv":
        return M.LightConv(a[1], a[2] if len(a) > 2 else 1, dtype=dtype, name=name)
    if m == "RepConv":
        return M.RepConv(a[1], a[2] if len(a) > 2 else 3, a[3] if len(a) > 3 else 1, dtype=dtype, name=name)
    if m == "AIFI":
        from .transformer import AIFI as _AIFI

        return _AIFI(a[0], a[1] if len(a) > 1 else 2048, a[2] if len(a) > 2 else 8, dtype=dtype, name=name)
    if m == "HGStem":
        return M.HGStem(a[1], a[2], dtype=dtype, name=name)
    if m == "HGBlock":
        return M.HGBlock(
            a[1], a[2], k=a[3] if len(a) > 3 else 3, n=a[4] if len(a) > 4 else 6,
            lightconv=bool(a[5]) if len(a) > 5 else False,
            shortcut=bool(a[6]) if len(a) > 6 else False,
            dtype=dtype, name=name,
        )
    if m == "ResNetLayer":
        return M.ResNetLayer(
            a[1], s=a[2] if len(a) > 2 else 1, is_first=bool(a[3]) if len(a) > 3 else False,
            n=a[4] if len(a) > 4 else 1, dtype=dtype, name=name,
        )
    if m in R.ALL_RESEARCH:
        return R.build_research_module(m, a, dtype, name)
    raise NotImplementedError(spec.module)


class DetectionModel(nn.Module):
    """Compiled YOLO graph with 'from'-index routing (tasks.py:83-112 semantics).

    __call__ modes:
      training=True             -> head raw maps (v10: dict of branches)
      training=False (default)  -> dict with 'pred' (B, A, 4+nc) decoded
                                   plus raw branch maps for val-loss use
      predict_only=True         -> {'pred': ...} only (o2m branch skipped)
    """

    specs: Tuple[LayerSpec, ...]
    save: Tuple[int, ...]
    nc: int
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0)
    reg_max: int = 16
    deploy: bool = False  # inference-only block rewrites (same variable tree)
    train_pack: bool = False  # width-pack the low-channel stages in TRAINING
    default_act: str = "silu"  # YAML `activation:` override for conv.py Convs
    quant: str = ""  # "int8": deploy convs run on the int8 MXU path (nn/quant.py)
    quant_scales: Tuple[float, ...] = ()  # calibrated per-site activation ranges
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False, predict_only: bool = False, text=None,
                 input_layout: str = "NHWC", dn=None, upto: Optional[int] = None):
        act_token = M.DEFAULT_ACT.set(self.default_act)
        try:
            if self.deploy and not training:
                # fold BN into conv kernels inline for every ConvBN in the graph
                # (single fusible conv+bias+act chains; see modules.DEPLOY_MATH)
                token = M.DEPLOY_MATH.set(True)
                qtoken = (
                    quant_lib.DEPLOY_INT8.set(quant_lib.QuantCtx(scales=self.quant_scales))
                    if self.quant == "int8"
                    else None
                )
                try:
                    return self._run(x, training, predict_only, text, input_layout, dn, upto)
                finally:
                    if qtoken is not None:
                        quant_lib.DEPLOY_INT8.reset(qtoken)
                    M.DEPLOY_MATH.reset(token)
            return self._run(x, training, predict_only, text, input_layout, dn, upto)
        finally:
            M.DEFAULT_ACT.reset(act_token)

    def _run(self, x, training, predict_only, text, input_layout, dn, upto=None):
        y: Dict[int, jnp.ndarray] = {}
        # Deploy serving path fed width-packed (B, H, W/8, 8*3): run the
        # low-channel stem prefix on the packed layout (dense 128 lanes),
        # unpack once at the end. NCHW callers are transposed to NHWC.
        if input_layout == "NCHW":
            x = jnp.transpose(x, (0, 2, 3, 1))
        # width-pack planning runs for the deploy serving graph AND (when
        # train_pack is set) the training graph: the early low-channel stages
        # dominate the train step via BN-stat reductions over 12-25%-filled
        # lane tiles (xplane-profiled: ~40% of the v10n b32 step), and the
        # packed layout makes those reads dense. Modules reproduce exact
        # training numerics on the packed layout (packed_conv + PackedBN).
        wpack_on = input_layout == "WPACK" and (
            (self.deploy and not training) or (self.train_pack and training)
        )
        cur_pack = 8 if input_layout == "WPACK" else 1  # raw feed comes x8
        if input_layout == "WPACK" and not wpack_on:
            x = M.unpack_width(x, 8)
            cur_pack = 1
        if text is None and any(
            s.module in ("C2fAttn", "WorldDetect", "ImagePoolingAttn") for s in self.specs
        ):
            # structural default for init/stride-probe; real text embeddings
            # are passed by the world predict path (set_classes)
            text = jnp.zeros((x.shape[0], self.nc, 512), self.dtype)
        txt = text  # running text features (ImagePoolingAttn updates them);
        # WorldDetect consumes the ORIGINAL text (tasks.py:615 ori_txt_feats)
        up_plan = (
            _up_fusion_plan(self.specs, self.save)
            if (self.deploy and not training)
            else {}
        )
        up_skip = {i for triple in up_plan.values() for i in triple[:2]}
        up_pending: Dict[int, jnp.ndarray] = {}
        s2d_plan = (
            _s2d_fuse_plan(self.specs, self.save)
            if ((self.deploy and not training) or (self.train_pack and training))
            else {}
        )
        s2d_sites = set(s2d_plan.values())
        # batch-aware gate: sub-128-lane and over-128-lane packing lose at
        # large batch (see _wpack_out docstring). Taken from the input image
        # batch once — mid-graph x may be a tuple (CBLinear outputs).
        dense_only = x.shape[0] >= 96
        for spec in self.specs:
            name = f"model_{spec.i}"
            is_last = spec.i == self.specs[-1].i

            if spec.i in up_skip:
                # deferred: the following C2f consumes the pre-upsample map
                # directly (upsample-commute, see _up_fusion_plan)
                if spec.module == "nn.Upsample":
                    up_pending[spec.i] = x if spec.f[0] == -1 else y[spec.f[0]]
                continue
            if spec.i in s2d_sites:
                # space_to_depth folded into the next layer's conv kernel
                # (modules.s2d_fold_kernel): the layout op never
                # materializes; x stays the pre-s2d map at its current pack
                continue

            # greedy width-pack plan (deploy serving path): any single-input
            # Conv/C2f with C<128 runs packed (P = 128/gcd(C,128)) — including
            # mid-graph neck blocks, which pack from an unpacked input via the
            # P_in=1 packed_conv case. Pack-factor changes between layers are
            # free reshapes (repack_width). y[] always stores unpacked copies,
            # so inputs read through y arrive unpacked; only the running x
            # carries pack.
            single_prev = len(spec.f) == 1 and spec.f[0] == -1
            p_in = cur_pack if single_prev else 1
            fold = spec.i in s2d_plan
            plan = (
                _wpack_out(spec, p_in, fold_s2d=fold, dense_only=dense_only,
                           deploy_graph=self.deploy and not training)
                if wpack_on
                else None
            )
            # fold sites run packed in training too: ConvBN/C2f-cv1 conv the
            # PACKED pre-s2d map with the s2d-folded RAW kernel + PackedBN
            # (exact; the pack<->unpack relayouts at the LPC fold boundaries
            # were ~16% of the train step before this)
            if plan is None:
                p_out = 0
                if cur_pack > 1 and -1 in spec.f:
                    x = _repack(x, cur_pack, 1)  # this layer needs NHWC x
                    cur_pack = 1
                p_in = 1
            else:
                p_used, p_out = plan
                if single_prev and cur_pack > 1 and cur_pack != p_used:
                    x = _repack(x, cur_pack, p_used)
                    cur_pack = p_used
                p_in = p_used

            if spec.module == "ImagePoolingAttn":
                # enhances the text features; x passes through untouched
                # (reference WorldModel.predict, tasks.py:624-627)
                xs = [x if j == -1 else y[j] for j in spec.f]
                ipa = M.ImagePoolingAttn(
                    ec=spec.args[0], ch=spec.args[-1], dtype=self.dtype, name=name
                )
                txt = ipa(xs, txt, training)
                if spec.i in self.save:
                    y[spec.i] = x
                continue

            if spec.module in _HEADS:
                # non-v10 head towers stay bf16 under int8 quantization
                # (accuracy headroom; <8% of serving FLOPs). v10Detect
                # quantizes its tower INTERMEDIATES itself and keeps only
                # the final DFL/logit projections bf16 (heads.py) — on x the
                # towers are ~12% of FLOPs and were the largest bf16
                # stragglers in the int8 xplane profile. suspend() is a
                # no-op when no QuantCtx is active, and runs identically in
                # the record and quantized traces so site keys stay aligned.
                if spec.module != "v10Detect":
                    quant_lib.suspend()
                xs = [x if j == -1 else y[j] for j in spec.f]
                if spec.module == "WorldDetect":
                    from .heads import WorldDetect as _WD

                    head = _WD(
                        nc=self.nc,
                        embed=spec.args[1] if len(spec.args) > 2 else 512,
                        with_bn=bool(spec.args[2]) if len(spec.args) > 3 else False,
                        ch=spec.args[-1],
                        strides=self.strides,
                        reg_max=self.reg_max,
                        dtype=self.dtype,
                        name=name,
                    )
                    feats = head(xs, text, training)
                    if training:
                        return feats
                    m_cls = text.shape[1]  # open-vocab class count = text rows
                    pred = decode_feats(feats, self.strides, m_cls, self.reg_max)
                    if predict_only:
                        return {"pred": pred}
                    return {"feats": feats, "pred": pred}
                if spec.module == "v10Detect":
                    head = V10Detect(
                        nc=self.nc,
                        ch=spec.args[-1],
                        strides=self.strides,
                        reg_max=self.reg_max,
                        dtype=self.dtype,
                        name=name,
                    )
                    serving = predict_only and not training
                    out = head(
                        xs, training,
                        branches="one2one" if serving else "both",
                        # training under the width-pack plan also splits: the
                        # loss re-slices the 64++nc concat anyway, and the
                        # packed box tower's output flattens straight into
                        # the loss's (B, A, 64) view
                        split=serving or (training and wpack_on),
                        train_pack=training and wpack_on,
                    )
                    if training:
                        return out
                    if predict_only:
                        # fused decode: top-k before DFL/sigmoid over split
                        # (box, cls) maps (heads.py:decode_feats_topk_split)
                        from .heads import decode_feats_topk_split

                        return {"det": decode_feats_topk_split(out["one2one"], self.strides, self.nc, self.reg_max)}
                    out["pred"] = decode_feats(out["one2one"], self.strides, self.nc, self.reg_max)
                    return out
                elif spec.module == "RTDETRDecoder":
                    # optional YAML args after nc mirror the reference ctor
                    # order (head.py:285): hd, nq, ndp, nh, ndl, d_ffn
                    extra = dict(
                        zip(("hd", "nq", "ndp", "nh", "ndl", "d_ffn"), spec.args[1:-1])
                    )
                    head = RTDETRDecoder(
                        nc=self.nc, ch=spec.args[-1], dtype=self.dtype, name=name, **extra,
                    )
                    out = head(xs, training, dn=dn)
                    if training:
                        return out
                    return {"pred": out}  # (B, nq, 4+nc), normalized cxcywh + sigmoid cls
                elif spec.module == "Pose":
                    kpt_shape = tuple(spec.args[1]) if len(spec.args) > 2 else (17, 3)
                    head = Pose(
                        nc=self.nc, kpt_shape=kpt_shape, ch=spec.args[-1],
                        strides=self.strides, reg_max=self.reg_max, dtype=self.dtype, name=name,
                    )
                    feats, kpt = head(xs, training)
                    if training:
                        return {"feats": feats, "kpt_raw": kpt}
                    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
                    out = {
                        "pred": decode_feats(feats, self.strides, self.nc, self.reg_max),
                        "kpt": decode_kpts(kpt, feat_shapes, self.strides, kpt_shape),
                    }
                    if not predict_only:
                        out["feats"] = feats
                    return out
                elif spec.module == "OBB":
                    ne = spec.args[1] if len(spec.args) > 2 else 1
                    head = OBB(
                        nc=self.nc, ne=ne, ch=spec.args[-1],
                        strides=self.strides, reg_max=self.reg_max, dtype=self.dtype, name=name,
                    )
                    feats, angle = head(xs, training)
                    if training:
                        return {"feats": feats, "angle": angle}
                    out = {"pred": decode_feats_obb(feats, angle, self.strides, self.nc, self.reg_max)}
                    if not predict_only:
                        out["feats"] = feats
                        out["angle"] = angle
                    return out
                elif spec.module == "Segment":
                    head = Segment(
                        nc=self.nc,
                        nm=spec.args[1],
                        npr=spec.args[2],
                        ch=spec.args[-1],
                        strides=self.strides,
                        reg_max=self.reg_max,
                        dtype=self.dtype,
                        name=name,
                    )
                    feats, mc, proto = head(xs, training)
                    if training:
                        return {"feats": feats, "mc": mc, "proto": proto}
                    pred = decode_feats(feats, self.strides, self.nc, self.reg_max)
                    out = {"pred": pred, "mc": mc, "proto": proto}
                    if not predict_only:
                        out["feats"] = feats
                    return out
                else:
                    head = Detect(
                        nc=self.nc,
                        ch=spec.args[-1],
                        strides=self.strides,
                        reg_max=self.reg_max,
                        dtype=self.dtype,
                        name=name,
                    )
                    feats = head(xs, training)
                    if training:
                        return feats
                    pred = decode_feats(feats, self.strides, self.nc, self.reg_max)
                    if predict_only:
                        return {"pred": pred}
                    return {"feats": feats, "pred": pred}

            if spec.module == "Classify":
                logits = Classify(nc=spec.args[1], dtype=self.dtype, name=name)(
                    x if spec.f[0] == -1 else y[spec.f[0]], training
                )
                if training:
                    return logits
                return {"probs": jax.nn.softmax(logits, axis=-1), "logits": logits}

            if spec.module in ("Concat", "CBFuse") or spec.module in R.MULTI_INPUT:
                inp = [x if j == -1 else y[j] for j in spec.f]
            else:
                inp = x if spec.f[0] == -1 else y[spec.f[0]]
            if spec.i in up_plan:
                ui, _ci, skip_j = up_plan[spec.i]
                module = _build_module(spec, self.dtype, name, deploy=self.deploy)
                x = module(y[skip_j], training, up_pair=(up_pending.pop(ui), y[skip_j]))
                cur_pack = 1
            elif spec.module == "C2fAttn":
                module = _build_module(spec, self.dtype, name, deploy=self.deploy)
                x = module(inp, txt, training)
                cur_pack = 1
            elif spec.n > 1:
                # reference stacks repeat-count copies in an nn.Sequential
                # (tasks.py:1047); unrolled here with per-copy param scopes
                # (plain Conv/Bottleneck repeats in v3/v6 and research blocks)
                x = inp
                for rep in range(spec.n):
                    x = _build_module(spec, self.dtype, f"{name}_{rep}", deploy=self.deploy)(x, training)
                cur_pack = 1
            elif p_out:
                module = _build_module(
                    spec, self.dtype, name, deploy=self.deploy,
                    pack_in=p_in, pack_out=p_out, s2d_in=fold,
                )
                x = module(inp, training)
                cur_pack = p_out
                if spec.i in self.save:
                    y[spec.i] = _repack(x, p_out, 1)
                if upto is not None and spec.i >= upto:
                    return _repack(x, cur_pack, 1) if cur_pack > 1 else x
                continue
            else:
                module = _build_module(spec, self.dtype, name, deploy=self.deploy, s2d_in=fold)
                x = module(inp, training)
                cur_pack = 1
            if spec.i in self.save:
                y[spec.i] = x
            if upto is not None and spec.i >= upto:
                # truncated graph (per-layer profiling): output of layer `upto`
                return _repack(x, cur_pack, 1) if cur_pack > 1 else x
        if cur_pack > 1:
            x = _repack(x, cur_pack, 1)
        return x  # headless graph (feature extractor)


def _infer_strides(model: DetectionModel, ch: int = 3, probe: int = 256) -> Tuple[float, ...]:
    """Probe output strides with jax.eval_shape (no FLOPs, no params on device).

    Mirrors the reference's dummy-forward stride probe (tasks.py:283-284).
    """
    x = jax.ShapeDtypeStruct((1, probe, probe, ch), jnp.float32)

    def init_fn(x):
        return model.init(jax.random.PRNGKey(0), x, training=True)

    # training=True output: v10 dict of tuples or v8 tuple of feats
    out = jax.eval_shape(
        lambda x: model.apply(
            model.init(jax.random.PRNGKey(0), x, training=True), x, training=True,
            mutable=["batch_stats"],
        )[0],
        x,
    )
    if isinstance(out, dict):
        feats = out.get("one2many") or out.get("feats")
    else:
        feats = out
    if not isinstance(feats, (tuple, list)):  # headless/classify graphs: no strides
        return (8.0, 16.0, 32.0)
    return tuple(float(probe / f.shape[1]) for f in feats)


def build_model(
    cfg: Union[str, Path, Dict],
    nc: Optional[int] = None,
    ch: int = 3,
    dtype: Any = None,
    deploy: bool = False,
    train_pack: bool = False,
    quant: str = "",
    quant_scales: Tuple[float, ...] = (),
) -> DetectionModel:
    """Build a DetectionModel from a YAML path/dict, with strides resolved.

    deploy=True enables inference-only block rewrites (e.g. slice/concat-free
    C2f). The variable tree is identical to deploy=False, so variables from a
    training build load unchanged.

    quant="int8" (deploy only) runs eligible convs on the int8 MXU path with
    per-site activation scales from `quant_scales` (see nn/quant.calibrate_int8).

    dtype=None resolves by backend: bfloat16 compute on TPU (the MXU's native
    format — params stay float32, linen's param dtype is separate; the loss
    and metric paths upcast at the same boundary as the reference's autocast),
    float32 elsewhere. Pass an explicit dtype to override.
    """
    if dtype is None:
        import jax as _jax

        dtype = jnp.bfloat16 if _jax.default_backend() == "tpu" else jnp.float32
    d = yaml_model_load(cfg) if not isinstance(cfg, dict) else dict(cfg)
    if nc is not None and nc != d.get("nc"):
        d["nc"] = nc
    specs, save = parse_model(d, ch=ch)
    # model-wide default-activation override (reference tasks.py: the YAML
    # `activation:` key rebinds Conv.default_act, e.g. yolov6's nn.ReLU())
    act_map = {"nn.ReLU()": "relu", "nn.SiLU()": "silu", "nn.Mish()": "mish", "nn.GELU()": "gelu"}
    default_act = act_map.get(str(d.get("activation", "")).strip(), "silu")
    model = DetectionModel(specs=specs, save=save, nc=d["nc"], default_act=default_act, dtype=dtype)
    strides = _infer_strides(model, ch=ch)
    if quant and not deploy:
        raise ValueError("quant='int8' requires deploy=True (it quantizes the deploy graph)")
    return DetectionModel(
        specs=specs, save=save, nc=d["nc"], strides=strides, deploy=deploy,
        train_pack=train_pack, default_act=default_act, dtype=dtype,
        quant=quant, quant_scales=tuple(quant_scales),
    )
