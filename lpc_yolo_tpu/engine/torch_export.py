"""TorchScript export: a jaxpr->torch interpreter flattened by torch.jit.trace.

Why this exists: the reference's `format='torchscript'` (reference
engine/exporter.py:308-330) serializes the torch module with
`torch.jit.trace(...).save(f, _extra_files={'config.txt': metadata})`, and its
C++/LibTorch example clients consume that artifact. This framework's models
are flax/JAX, so the TPU-native route mirrors engine/onnx_export.py: trace the
predict function to a jaxpr (the closed set of XLA primitives every compiled
model reduces to), then *interpret* that jaxpr with torch ops and let
`torch.jit.trace` record the interpretation into a standalone TorchScript
graph. Constant subgraphs (iota/anchor math, folded BN chains) are evaluated
at export time on the JAX CPU backend and baked in as graph constants, same
as the ONNX converter.

The artifact is self-contained: `torch.jit.load(path)` in a weights-free
process (or LibTorch in C++) runs the model with no JAX anywhere.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.extend import core as jcore

_FOLD_LIMIT_BYTES = 1 << 22  # same policy as onnx_export

_CALL_PRIMS = (
    "pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call",
    "custom_vjp_call_jaxpr", "remat", "checkpoint", "core_call", "xla_call",
)


def _torch():
    import torch  # deferred: torch is heavy and only needed at export time

    return torch


def _torch_dtype(np_dtype):
    torch = _torch()
    return {
        "float32": torch.float32, "float64": torch.float64, "float16": torch.float16,
        "bfloat16": torch.bfloat16, "int64": torch.int64, "int32": torch.int32,
        "int16": torch.int16, "int8": torch.int8, "uint8": torch.uint8, "bool": torch.bool,
    }[np.dtype(np_dtype).name]


def _as_torch(arr: np.ndarray):
    torch = _torch()
    arr = np.asarray(arr)
    if arr.dtype.name == "bfloat16":  # ml_dtypes bfloat16: numpy can't hand it to torch directly
        return torch.from_numpy(np.ascontiguousarray(arr.astype(np.float32))).to(torch.bfloat16)
    return torch.from_numpy(np.ascontiguousarray(arr))


# --------------------------------------------------------------------------
# primitive handlers: fn(eqn, ins) -> tensor | list[tensor]
# `ins` are torch tensors (consts already materialized)
# --------------------------------------------------------------------------

_HANDLERS: Dict[str, Any] = {}


def _on(*names):
    def deco(fn):
        for n in names:
            _HANDLERS[n] = fn
        return fn

    return deco


def _ew(fn):
    return lambda eqn, ins: fn(*ins)


def _register_elementwise():
    torch = _torch()
    table = {
        "add": torch.add, "sub": torch.sub, "mul": torch.mul,
        "max": torch.maximum, "min": torch.minimum,
        "abs": torch.abs, "neg": torch.neg, "exp": torch.exp, "log": torch.log,
        "tanh": torch.tanh, "sqrt": torch.sqrt, "sign": torch.sign,
        "logistic": torch.sigmoid, "floor": torch.floor, "ceil": torch.ceil,
        "pow": torch.pow, "rsqrt": torch.rsqrt, "log1p": torch.log1p,
        "is_finite": torch.isfinite, "sin": torch.sin, "cos": torch.cos,
        "eq": torch.eq, "ne": torch.ne, "lt": torch.lt, "le": torch.le,
        "gt": torch.gt, "ge": torch.ge,
        "and": torch.logical_and, "or": torch.logical_or,
        "xor": torch.logical_xor, "not": torch.logical_not,
    }
    for prim, fn in table.items():
        _HANDLERS.setdefault(prim, _ew(fn))


@_on("div")
def _div(eqn, ins):
    torch = _torch()
    x, y = ins
    if not x.dtype.is_floating_point:  # lax.div on ints truncates toward zero
        return torch.div(x, y, rounding_mode="trunc")
    return torch.div(x, y)


@_on("rem")
def _rem(eqn, ins):
    return _torch().fmod(ins[0], ins[1])  # lax.rem = C-style trunc remainder


@_on("integer_pow")
def _integer_pow(eqn, ins):
    return ins[0] ** int(eqn.params["y"])


@_on("select_n")
def _select_n(eqn, ins):
    torch = _torch()
    pred, *cases = ins
    if pred.dtype == torch.bool and len(cases) == 2:
        return torch.where(pred, cases[1], cases[0])
    out = cases[0]
    for i, c in enumerate(cases[1:], start=1):
        out = torch.where(pred == i, c, out)
    return out


@_on("convert_element_type")
def _convert(eqn, ins):
    return ins[0].to(_torch_dtype(eqn.params["new_dtype"]))


@_on("stop_gradient", "copy")
def _identity(eqn, ins):
    return ins[0]


@_on("reshape")
def _reshape(eqn, ins):
    if eqn.params.get("dimensions") is not None:
        raise NotImplementedError("torchscript export: reshape with dimensions")
    return ins[0].reshape([int(s) for s in eqn.params["new_sizes"]])


@_on("squeeze")
def _squeeze(eqn, ins):
    return ins[0].reshape(list(eqn.outvars[0].aval.shape))


@_on("expand_dims")
def _expand_dims(eqn, ins):
    return ins[0].reshape(list(eqn.outvars[0].aval.shape))


@_on("transpose")
def _transpose(eqn, ins):
    return ins[0].permute([int(p) for p in eqn.params["permutation"]])


@_on("rev")
def _rev(eqn, ins):
    return _torch().flip(ins[0], [int(d) for d in eqn.params["dimensions"]])


@_on("broadcast_in_dim")
def _broadcast_in_dim(eqn, ins):
    shape = [int(s) for s in eqn.params["shape"]]
    bdims = [int(d) for d in eqn.params["broadcast_dimensions"]]
    aligned = [1] * len(shape)
    for src_axis, dst_axis in enumerate(bdims):
        aligned[dst_axis] = int(ins[0].shape[src_axis])
    return ins[0].reshape(aligned).expand(shape)


@_on("concatenate")
def _concatenate(eqn, ins):
    # expand() outputs are non-contiguous views; cat handles them fine
    return _torch().cat(list(ins), dim=int(eqn.params["dimension"]))


@_on("slice")
def _slice(eqn, ins):
    starts = eqn.params["start_indices"]
    limits = eqn.params["limit_indices"]
    strides = eqn.params["strides"] or [1] * len(starts)
    idx = tuple(slice(int(s), int(l), int(st)) for s, l, st in zip(starts, limits, strides))
    return ins[0][idx]


@_on("split")
def _split(eqn, ins):
    torch = _torch()
    sizes = [int(s) for s in eqn.params["sizes"]]
    return list(torch.split(ins[0], sizes, dim=int(eqn.params["axis"])))


@_on("pad")
def _pad(eqn, ins):
    torch = _torch()
    x, pad_val = ins
    cfg = eqn.params["padding_config"]
    if any(int(i) != 0 for _, _, i in cfg):
        raise NotImplementedError("torchscript export: interior (dilating) pad")
    # positive pads via F.pad (last dim first), negative pads via slicing
    pos = []
    for lo, hi, _ in reversed(cfg):
        pos.extend([max(int(lo), 0), max(int(hi), 0)])
    if any(pos):
        x = torch.nn.functional.pad(x, pos, mode="constant", value=float(pad_val))
    neg = tuple(
        slice(-min(int(lo), 0), x.shape[d] + min(int(hi), 0)) for d, (lo, hi, _) in enumerate(cfg)
    )
    if any(s != slice(0, x.shape[d]) for d, s in enumerate(neg)):
        x = x[neg]
    return x


def _reduce(fn_name):
    def fn(eqn, ins):
        torch = _torch()
        dims = [int(a) for a in eqn.params["axes"]]
        return getattr(torch, fn_name)(ins[0], dim=dims, keepdim=False) if dims else ins[0]

    return fn


_HANDLERS["reduce_sum"] = _reduce("sum")
_HANDLERS["reduce_max"] = _reduce("amax")
_HANDLERS["reduce_min"] = _reduce("amin")


@_on("reduce_prod")
def _reduce_prod(eqn, ins):
    torch = _torch()
    x = ins[0]
    for d in sorted((int(a) for a in eqn.params["axes"]), reverse=True):
        x = torch.prod(x, dim=d, keepdim=False)
    return x


@_on("reduce_and")
def _reduce_and(eqn, ins):
    x = ins[0]
    for d in sorted((int(a) for a in eqn.params["axes"]), reverse=True):
        x = x.all(dim=d)
    return x


@_on("reduce_or")
def _reduce_or(eqn, ins):
    x = ins[0]
    for d in sorted((int(a) for a in eqn.params["axes"]), reverse=True):
        x = x.any(dim=d)
    return x


@_on("argmax")
def _argmax(eqn, ins):
    axes = eqn.params["axes"]
    if len(axes) != 1:
        raise NotImplementedError("torchscript export: multi-axis argmax")
    return _torch().argmax(ins[0], dim=int(axes[0])).to(_torch_dtype(eqn.outvars[0].aval.dtype))


@_on("top_k")
def _top_k(eqn, ins):
    torch = _torch()
    vals, idxs = torch.topk(ins[0], int(eqn.params["k"]), dim=-1, sorted=True)
    return [vals, idxs.to(_torch_dtype(eqn.outvars[1].aval.dtype))]


@_on("iota")
def _iota(eqn, ins):
    p = eqn.params
    dim, shape = int(p["dimension"]), [int(s) for s in p["shape"]]
    vec = np.arange(shape[dim], dtype=p["dtype"])
    arr = np.broadcast_to(vec.reshape([-1 if i == dim else 1 for i in range(len(shape))]), shape)
    return _as_torch(np.ascontiguousarray(arr))


@_on("conv_general_dilated")
def _conv(eqn, ins):
    torch = _torch()
    F = torch.nn.functional
    p = eqn.params
    dn = p["dimension_numbers"]
    if int(p.get("batch_group_count", 1)) != 1:
        raise NotImplementedError("torchscript export: batch_group_count > 1")
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    n_spatial = len(lhs_spec) - 2
    if n_spatial != 2:
        raise NotImplementedError("torchscript export: only 2D convs")
    x = ins[0].permute(_perm_to_nchw(lhs_spec)).contiguous()
    if any(int(d) != 1 for d in p["lhs_dilation"]):
        # transposed conv (lax.conv_transpose lowers to an lhs-dilated conv):
        # zero-insert between input elements, then run a regular conv — exact
        # lhs_dilation semantics (Proto head upsample; runs once per forward)
        dh, dw = [int(d) for d in p["lhs_dilation"]]
        n_, c_, h_, w_ = x.shape
        z = x.new_zeros((n_, c_, h_, dh, w_, dw))
        z[:, :, :, 0, :, 0] = x
        x = z.reshape(n_, c_, h_ * dh, w_ * dw)[
            :, :, : (h_ - 1) * dh + 1, : (w_ - 1) * dw + 1
        ].contiguous()
    w = ins[1].permute(_perm_to_nchw(rhs_spec)).contiguous()
    # XLA padding may be asymmetric; pad explicitly (F.pad is last-dim-first)
    (ph_lo, ph_hi), (pw_lo, pw_hi) = [(int(lo), int(hi)) for lo, hi in p["padding"]]
    if ph_lo or ph_hi or pw_lo or pw_hi:
        x = F.pad(x, [pw_lo, pw_hi, ph_lo, ph_hi])
    y = F.conv2d(
        x, w,
        stride=[int(s) for s in p["window_strides"]],
        dilation=[int(d) for d in p["rhs_dilation"]],
        groups=int(p["feature_group_count"]),
    )
    return y.permute(_inv_perm(_perm_to_nchw(out_spec)))


@_on("reduce_window_max")
def _maxpool(eqn, ins):
    torch = _torch()
    F = torch.nn.functional
    p = eqn.params
    window = [int(w) for w in p["window_dimensions"]]
    strides = [int(s) for s in p["window_strides"]]
    padding = [(int(lo), int(hi)) for lo, hi in p["padding"]]
    rank = len(window)
    if any(int(d) != 1 for d in p.get("base_dilation", [1] * rank)):
        raise NotImplementedError("torchscript export: dilated-base pooling")
    if any(int(d) != 1 for d in p.get("window_dilation", [1] * rank)):
        raise NotImplementedError("torchscript export: dilated-window pooling")
    spatial = [i for i in range(rank) if window[i] != 1 or strides[i] != 1 or padding[i] != (0, 0)]
    passive = [i for i in range(rank) if i not in spatial]
    if not spatial:
        return ins[0]
    if len(passive) < 2:
        raise NotImplementedError("torchscript export: pooling without batch/channel dims")
    n, c = passive[0], passive[1]
    spatial = spatial + passive[2:]  # leftovers pool with window 1
    perm = [n, c, *spatial]
    x = ins[0].permute(perm).contiguous() if perm != list(range(rank)) else ins[0]
    pads = []
    for i in reversed(spatial):
        pads.extend([padding[i][0], padding[i][1]])
    if any(pads):
        x = F.pad(x, pads, mode="constant", value=float("-inf"))
    pool = {1: F.max_pool1d, 2: F.max_pool2d, 3: F.max_pool3d}.get(len(spatial))
    if pool is None:
        raise NotImplementedError(f"torchscript export: {len(spatial)}-D pooling")
    y = pool(x, kernel_size=[window[i] for i in spatial], stride=[strides[i] for i in spatial])
    inv = _inv_perm(perm)
    return y.permute(inv) if inv != list(range(rank)) else y


@_on("dot_general")
def _dot_general(eqn, ins):
    torch = _torch()
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs_shape = tuple(eqn.invars[0].aval.shape)
    rhs_shape = tuple(eqn.invars[1].aval.shape)
    lf = [i for i in range(len(lhs_shape)) if i not in lc and i not in lb]
    rf = [i for i in range(len(rhs_shape)) if i not in rc and i not in rb]

    def prep(x, shape, batch, free, contract, contract_last):
        order = list(batch) + (list(free) + list(contract) if contract_last else list(contract) + list(free))
        if order != list(range(len(shape))):
            x = x.permute(order).contiguous()
        bshape = [int(shape[i]) for i in batch]
        fsz = int(np.prod([shape[i] for i in free])) if free else 1
        csz = int(np.prod([shape[i] for i in contract])) if contract else 1
        return x.reshape(bshape + ([fsz, csz] if contract_last else [csz, fsz]))

    lhs2 = prep(ins[0], lhs_shape, [int(i) for i in lb], lf, [int(i) for i in lc], True)
    rhs2 = prep(ins[1], rhs_shape, [int(i) for i in rb], rf, [int(i) for i in rc], False)
    y = torch.matmul(lhs2, rhs2)
    return y.reshape(list(eqn.outvars[0].aval.shape))


@_on("gather")
def _gather(eqn, ins, const_idx=None):
    """Strided-slice-pattern gathers (space_to_depth / `x[:, ::2, ::2]`)
    lower to stepped tensor slicing — same subset as the ONNX converter."""
    p = eqn.params
    dn = p["dimension_numbers"]
    operand_shape = tuple(eqn.invars[0].aval.shape)
    rank = len(operand_shape)
    obd = tuple(getattr(dn, "operand_batching_dims", ()) or ())
    sbd = tuple(getattr(dn, "start_indices_batching_dims", ()) or ())
    nb = len(obd)
    idx_rank = len(eqn.invars[1].aval.shape)
    if (
        nb
        and obd == tuple(range(nb))
        and sbd == obd
        and tuple(dn.start_index_map) == (nb,)
        and tuple(dn.collapsed_slice_dims) == (nb,)
        and tuple(dn.offset_dims) == tuple(range(idx_rank - 1, idx_rank - 1 + rank - nb - 1))
        and all(p["slice_sizes"][d] == 1 for d in range(nb + 1))
        and all(p["slice_sizes"][d] == operand_shape[d] for d in range(nb + 1, rank))
    ):
        # dynamic batched row-gather (jnp.take_along_axis over leading batch
        # dims — the v10 decode's top-k row selection): torch.gather with the
        # index expanded over the trailing slice dims.
        torch = _torch()
        tgt = ins[1].squeeze(-1).to(torch.int64)  # (B..., k)
        for _ in range(nb + 1, rank):
            tgt = tgt.unsqueeze(-1)
        tgt = tgt.expand(list(tgt.shape[: nb + 1]) + [operand_shape[d] for d in range(nb + 1, rank)])
        return torch.gather(ins[0], nb, tgt)
    idx_shape = tuple(eqn.invars[1].aval.shape)
    if (
        not nb
        and len(dn.start_index_map) == 1
        and tuple(dn.collapsed_slice_dims) == tuple(dn.start_index_map)
        and len(idx_shape) == 2
        and idx_shape[-1] == 1
        and tuple(dn.offset_dims) == tuple(i for i in range(rank) if i != dn.start_index_map[0])
        and all(
            p["slice_sizes"][i] == (1 if i == dn.start_index_map[0] else operand_shape[i])
            for i in range(rank)
        )
    ):
        # dynamic single-axis row gather (take_along_axis at batch 1 loses its
        # batching dims): torch.index_select with 1-D indices
        torch = _torch()
        d = int(dn.start_index_map[0])
        return torch.index_select(ins[0], d, ins[1].reshape(-1).to(torch.int64))
    if const_idx is None:
        raise NotImplementedError("torchscript export: gather with non-constant indices")
    idx = np.asarray(const_idx)
    dims = tuple(dn.start_index_map)
    k = idx.shape[-1]
    if (
        tuple(dn.collapsed_slice_dims) != dims
        or tuple(sorted(dims)) != dims
        or idx.ndim != k + 1
        or any(p["slice_sizes"][d] != (1 if d in dims else operand_shape[d]) for d in range(len(operand_shape)))
    ):
        raise NotImplementedError("torchscript export: general gather (only strided-slice patterns)")
    expect_offsets = [d for d in range(len(operand_shape)) if d not in dims]
    if tuple(dn.offset_dims) != tuple(expect_offsets):
        raise NotImplementedError("torchscript export: gather with permuted output dims")
    index = [slice(None)] * len(operand_shape)
    for comp_axis, d in enumerate(dims):
        comp = idx[..., comp_axis]
        n = comp.shape[comp_axis]
        base = comp[tuple(slice(0, 1) if ax != comp_axis else slice(None) for ax in range(comp.ndim))].reshape(n)
        step = int(base[1] - base[0]) if n > 1 else 1
        if n > 1 and not np.all(np.diff(base) == step):
            raise NotImplementedError("torchscript export: gather with irregular stride")
        full = np.broadcast_to(
            base.reshape([n if ax == comp_axis else 1 for ax in range(comp.ndim)]), comp.shape
        )
        if not np.array_equal(comp, full):
            raise NotImplementedError("torchscript export: gather index varies across other axes")
        start = int(base[0])
        index[d] = slice(start, start + step * n, step if step != 0 else 1)
    return ins[0][tuple(index)]


def _perm_to_nchw(spec) -> List[int]:
    # spec is a tuple like (batch, feature, *spatial) position encoding used by
    # lax.ConvDimensionNumbers: spec[i] = axis index of logical dim i
    n_spatial = len(spec) - 2
    return [spec[0], spec[1], *[spec[2 + i] for i in range(n_spatial)]]


def _inv_perm(p: Sequence[int]) -> List[int]:
    out = [0] * len(p)
    for i, v in enumerate(p):
        out[v] = i
    return out


# --------------------------------------------------------------------------
# interpreter
# --------------------------------------------------------------------------


class _Interp:
    """Walks a closed jaxpr, constant-folding on the JAX CPU backend and
    executing the live path with torch ops (recorded by torch.jit.trace)."""

    def __init__(self):
        self.env: Dict[Any, Tuple[str, Any]] = {}  # var -> ("const", np) | ("tensor", torch.Tensor)

    def read(self, var):
        if isinstance(var, jcore.Literal):
            return ("const", np.asarray(var.val, var.aval.dtype))
        return self.env[var]

    def tensor(self, var):
        kind, val = self.read(var)
        return _as_torch(val) if kind == "const" else val

    def write(self, var, kind, val):
        if type(var).__name__ != "DropVar":
            self.env[var] = (kind, val)

    def run(self, jaxpr, consts, in_bindings):
        for v, c in zip(jaxpr.constvars, consts):
            self.write(v, "const", np.asarray(c))
        for v, binding in zip(jaxpr.invars, in_bindings):
            self.write(v, *binding)
        for eqn in jaxpr.eqns:
            self.eqn(eqn)

    def eqn(self, eqn):
        name = eqn.primitive.name
        if name in _CALL_PRIMS:
            inner = None
            for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                cand = eqn.params.get(k)
                if cand is not None and (hasattr(cand, "eqns") or hasattr(cand, "jaxpr")):
                    inner = cand
                    break
            if inner is not None:
                sub, consts = (inner.jaxpr, inner.consts) if hasattr(inner, "jaxpr") else (inner, [])
                child = _Interp()
                child.run(sub, consts, [self.read(v) for v in eqn.invars[: len(sub.invars)]])
                for outer, inner_out in zip(eqn.outvars, sub.outvars):
                    self.write(outer, *child.read(inner_out))
                return

        ins = [self.read(v) for v in eqn.invars]
        if all(k == "const" for k, _ in ins):
            out_bytes = sum(int(np.prod(o.aval.shape)) * o.aval.dtype.itemsize for o in eqn.outvars)
            if out_bytes <= _FOLD_LIMIT_BYTES or name in (
                "iota", "reshape", "broadcast_in_dim", "transpose", "convert_element_type", "concatenate",
            ):
                with jax.default_device(jax.local_devices(backend="cpu")[0]):
                    vals = eqn.primitive.bind(*[jnp.asarray(v) for _, v in ins], **eqn.params)
                if not eqn.primitive.multiple_results:
                    vals = [vals]
                for var, val in zip(eqn.outvars, vals):
                    self.write(var, "const", np.asarray(val))
                return

        handler = _HANDLERS.get(name)
        if handler is None:
            raise NotImplementedError(
                f"torchscript export: primitive '{name}' has no handler (shapes: "
                f"{[tuple(v.aval.shape) for v in eqn.invars]}). Extend engine/torch_export.py."
            )
        tensors = [self.tensor(v) for v in eqn.invars]
        if name == "gather":
            kind, idx = self.read(eqn.invars[1])
            outs = handler(eqn, tensors, const_idx=idx if kind == "const" else None)
        else:
            outs = handler(eqn, tensors)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        for var, out in zip(eqn.outvars, outs):
            self.write(var, "tensor", out)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def export_torchscript(
    fn,
    example_args: Sequence[Any],
    path: str,
    metadata: Optional[Dict[str, Any]] = None,
) -> str:
    """Trace `fn(*example_args)` and save a TorchScript artifact to `path`.

    `example_args` may be arrays or jax.ShapeDtypeStructs (static shapes).
    Metadata is stored in `_extra_files['config.txt']` like the reference
    exporter (engine/exporter.py:326-330) so LibTorch clients can read it via
    `torch::jit::load(f, &extra_files)`.
    """
    torch = _torch()
    _register_elementwise()
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr

    def torch_fn(*inputs):
        interp = _Interp()
        interp.run(jaxpr, closed.consts, [("tensor", t) for t in inputs])
        outs = [interp.tensor(v) for v in jaxpr.outvars]
        return outs[0] if len(outs) == 1 else tuple(outs)

    rng = np.random.default_rng(0)
    example = tuple(
        _as_torch(rng.standard_normal(v.aval.shape).astype(v.aval.dtype)
                  if np.issubdtype(v.aval.dtype, np.floating)
                  else np.zeros(v.aval.shape, v.aval.dtype))
        for v in jaxpr.invars
    )
    with torch.no_grad():
        traced = torch.jit.trace(torch_fn, example)
    extra = {"config.txt": json.dumps(metadata or {})}
    traced.save(str(path), _extra_files=extra)
    return str(path)
