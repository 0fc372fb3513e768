"""ONNX export without the `onnx` package: a jaxpr->ONNX graph converter on
top of a minimal protobuf wire-format writer.

Why this exists: the reference exports ONNX via `torch.onnx` + the `onnx`
pip package (reference engine/exporter.py:354-420), neither of which is in
this environment. The TPU-native route is also the more general one — any
jittable function in this framework traces to a jaxpr, and the deploy
forward uses a small closed set of XLA primitives (convs, elementwise, a few
shape ops), so converting the *trace* covers every model the YAML compiler
can build instead of hand-porting module-by-module.

Wire format: ONNX models are protobuf messages (onnx.proto). Encoding one is
just varints and length-delimited fields, so `_Msg` below implements exactly
the subset needed (no proto toolchain). The artifact is validated end-to-end
by OpenCV's dnn ONNX importer in tests/test_onnx.py — an *independent*
decoder + runtime, mirroring the reference's OpenCV-DNN example client
(examples/YOLOv8-CPP-Inference/inference.cpp).

Design:
  1. `jax.make_jaxpr(fn)` on the export wrapper (fp32, static shapes).
  2. Inline all call-like primitives (pjit / custom_jvp / closures).
  3. Constant-fold every equation whose inputs are known (this eliminates
     iota/anchor math and folds BN scale chains into initializers).
  4. Emit ONNX nodes per primitive from a registry; convs/pools transpose
     through NCHW around the ONNX op (ONNX is NCHW-only; the graph itself
     stays in the model's native NHWC between them — XLA-style layout
     freedom, and OpenCV folds the transpose pairs).

Targets opset 12 (attribute-form Split/Squeeze/Reduce*, input-form Slice),
ir_version 7 — the widest-compat combination for OpenCV/ORT-era importers.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.extend import core as jcore

# --------------------------------------------------------------------------
# protobuf wire format (the subset ONNX needs: varint + length-delimited +
# fixed32 for AttributeProto.f)
# --------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    n &= (1 << 64) - 1  # negative int64 -> two's complement, per proto spec
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _vint(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(int(value))


def _blob(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _string(field: int, s: str) -> bytes:
    return _blob(field, s.encode("utf-8"))


def _fixed32(field: int, f: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", float(f))


def _packed_i64(field: int, values: Sequence[int]) -> bytes:
    payload = b"".join(_varint(int(v)) for v in values)
    return _blob(field, payload)


# --------------------------------------------------------------------------
# ONNX IR builders (field numbers from onnx.proto)
# --------------------------------------------------------------------------

# TensorProto.DataType
_DT = {
    np.dtype(np.float32): 1,
    np.dtype(np.uint8): 2,
    np.dtype(np.int8): 3,
    np.dtype(np.int32): 6,
    np.dtype(np.int64): 7,
    np.dtype(np.bool_): 9,
    np.dtype(np.float16): 10,
    np.dtype(np.float64): 11,
    np.dtype(np.uint32): 12,
    np.dtype(np.uint64): 13,
}


def _onnx_dtype(dtype) -> int:
    dt = np.dtype(dtype)
    if dt not in _DT:
        raise NotImplementedError(f"ONNX export: unsupported dtype {dt}")
    return _DT[dt]


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    out = b"".join(_vint(1, d) for d in arr.shape)
    out += _vint(2, _onnx_dtype(arr.dtype))
    out += _string(8, name)
    out += _blob(9, arr.tobytes())  # raw_data (little-endian, matches x86/TPU hosts)
    return out


def _attr(name: str, value) -> bytes:
    out = _string(1, name)
    if isinstance(value, (bool, int, np.integer)):
        out += _vint(3, int(value)) + _vint(20, 2)  # i / INT
    elif isinstance(value, float):
        out += _fixed32(2, value) + _vint(20, 1)  # f / FLOAT
    elif isinstance(value, str):
        out += _blob(4, value.encode()) + _vint(20, 3)  # s / STRING
    elif isinstance(value, np.ndarray):
        out += _blob(5, _tensor_proto("", value)) + _vint(20, 4)  # t / TENSOR
    elif isinstance(value, (list, tuple)) and all(isinstance(v, (int, np.integer)) for v in value):
        out += b"".join(_vint(8, int(v)) for v in value) + _vint(20, 7)  # ints / INTS
    elif isinstance(value, (list, tuple)) and all(isinstance(v, float) for v in value):
        out += b"".join(_fixed32(7, v) for v in value) + _vint(20, 6)  # floats / FLOATS
    else:
        raise TypeError(f"attribute {name}: unsupported value {value!r}")
    return out


def _node_proto(op: str, inputs: Sequence[str], outputs: Sequence[str], name: str, attrs: Dict[str, Any]) -> bytes:
    out = b"".join(_string(1, i) for i in inputs)
    out += b"".join(_string(2, o) for o in outputs)
    out += _string(3, name) + _string(4, op)
    out += b"".join(_blob(5, _attr(k, v)) for k, v in attrs.items())
    return out


def _value_info(name: str, shape: Sequence[int], dtype) -> bytes:
    dims = b"".join(_blob(1, _vint(1, d)) for d in shape)  # TensorShapeProto.Dimension.dim_value
    tensor_type = _vint(1, _onnx_dtype(dtype)) + _blob(2, dims)
    return _string(1, name) + _blob(2, _blob(1, tensor_type))


def _model_proto(nodes: List[bytes], initializers: List[bytes], inputs: List[bytes],
                 outputs: List[bytes], graph_name: str, opset: int = 12) -> bytes:
    graph = b"".join(_blob(1, n) for n in nodes)
    graph += _string(2, graph_name)
    graph += b"".join(_blob(5, t) for t in initializers)
    graph += b"".join(_blob(11, vi) for vi in inputs)
    graph += b"".join(_blob(12, vi) for vi in outputs)
    model = _vint(1, 7)  # ir_version 7
    model += _string(2, "lpc_yolo_tpu")
    model += _string(3, "1.0")
    model += _blob(7, graph)
    model += _blob(8, _string(1, "") + _vint(2, opset))  # opset_import
    return model


# --------------------------------------------------------------------------
# jaxpr -> ONNX graph
# --------------------------------------------------------------------------

_FOLD_LIMIT_BYTES = 1 << 22  # don't materialize folded constants above 4 MB


class _Builder:
    def __init__(self):
        self.nodes: List[bytes] = []
        self.initializers: List[bytes] = []
        self._n = 0
        self._const_cache: Dict[int, str] = {}

    def fresh(self, hint: str = "t") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def const(self, arr: np.ndarray, hint: str = "c") -> str:
        arr = np.asarray(arr)
        if arr.dtype == np.bool_:
            pass  # bool initializers are legal ONNX
        name = self.fresh(hint)
        self.initializers.append(_tensor_proto(name, arr))
        return name

    def i64(self, values: Sequence[int], hint: str = "shape") -> str:
        return self.const(np.asarray(list(values), np.int64), hint)

    def add(self, op: str, inputs: Sequence[str], n_out: int = 1, hint: Optional[str] = None, **attrs) -> List[str]:
        outs = [self.fresh(hint or op.lower()) for _ in range(n_out)]
        self.nodes.append(_node_proto(op, inputs, outs, self.fresh(f"n_{op}"), attrs))
        return outs

    def add1(self, op: str, inputs: Sequence[str], hint: Optional[str] = None, **attrs) -> str:
        return self.add(op, inputs, 1, hint, **attrs)[0]


def _perm_to_nchw(spec) -> List[int]:
    """spec = (batch_dim, feature_dim, *spatial_dims) -> permutation to NC+spatial."""
    return [spec[0], spec[1], *spec[2:]]


def _inv_perm(p: Sequence[int]) -> List[int]:
    inv = [0] * len(p)
    for i, d in enumerate(p):
        inv[d] = i
    return inv


class _Converter:
    """Walks a closed jaxpr, constant-folding and emitting ONNX nodes."""

    def __init__(self, builder: _Builder):
        self.b = builder
        # var -> ("const", np.ndarray) | ("tensor", name)
        self.env: Dict[Any, Tuple[str, Any]] = {}

    # -- environment ------------------------------------------------------
    def read(self, var):
        if isinstance(var, jcore.Literal):
            return ("const", np.asarray(var.val, var.aval.dtype))
        return self.env[var]

    def tensor_name(self, var) -> str:
        kind, val = self.read(var)
        if kind == "tensor":
            return val
        return self.b.const(val, "w")

    def write(self, var, kind: str, val) -> None:
        if type(var).__name__ == "DropVar":
            return
        self.env[var] = (kind, val)

    # -- driver ------------------------------------------------------------
    def run(self, jaxpr, consts, in_bindings) -> None:
        for v, c in zip(jaxpr.constvars, consts):
            self.write(v, "const", np.asarray(c))
        for v, binding in zip(jaxpr.invars, in_bindings):
            self.write(v, *binding)
        for eqn in jaxpr.eqns:
            self.eqn(eqn)

    def eqn(self, eqn) -> None:
        name = eqn.primitive.name
        # call-like primitives: inline the inner jaxpr
        inner = None
        if name in ("pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call",
                    "custom_vjp_call_jaxpr", "remat", "checkpoint", "core_call", "xla_call"):
            for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                cand = eqn.params.get(k)
                if cand is not None and (hasattr(cand, "eqns") or hasattr(cand, "jaxpr")):
                    inner = cand
                    break
        if inner is not None:
            if hasattr(inner, "jaxpr"):  # ClosedJaxpr
                sub, consts = inner.jaxpr, inner.consts
            else:
                sub, consts = inner, []
            child = _Converter(self.b)
            child.run(sub, consts, [self.read(v) for v in eqn.invars[: len(sub.invars)]])
            for outer, inner_out in zip(eqn.outvars, sub.outvars):
                self.write(outer, *child.read(inner_out))
            return

        ins = [self.read(v) for v in eqn.invars]
        # constant fold when every input is known and the result is small
        if all(k == "const" for k, _ in ins):
            out_bytes = sum(int(np.prod(o.aval.shape)) * o.aval.dtype.itemsize for o in eqn.outvars)
            if out_bytes <= _FOLD_LIMIT_BYTES or name in ("iota", "reshape", "broadcast_in_dim",
                                                          "transpose", "convert_element_type", "concatenate"):
                with jax.default_device(jax.local_devices(backend="cpu")[0]):
                    vals = eqn.primitive.bind(*[jnp.asarray(v) for _, v in ins], **eqn.params)
                if not eqn.primitive.multiple_results:
                    vals = [vals]
                for var, val in zip(eqn.outvars, vals):
                    self.write(var, "const", np.asarray(val))
                return

        emitter = _EMITTERS.get(name)
        if emitter is None:
            raise NotImplementedError(
                f"ONNX export: primitive '{name}' has no emitter (shapes: "
                f"{[tuple(v.aval.shape) for v in eqn.invars]}). Extend engine/onnx_export.py."
            )
        names = [self.tensor_name(v) for v in eqn.invars]
        self.b._conv = self  # let emitters peek at const inputs (gather)
        outs = emitter(self.b, eqn, names)
        if isinstance(outs, str):
            outs = [outs]
        for var, out_name in zip(eqn.outvars, outs):
            self.write(var, "tensor", out_name)


# -- primitive emitters ------------------------------------------------------

_EMITTERS: Dict[str, Any] = {}


def _emit(*names):
    def deco(fn):
        for n in names:
            _EMITTERS[n] = fn
        return fn

    return deco


def _elementwise(op: str):
    def fn(b: _Builder, eqn, ins):
        return b.add1(op, ins)

    return fn


for _prim, _op in {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div", "max": "Max", "min": "Min",
    "abs": "Abs", "neg": "Neg", "exp": "Exp", "log": "Log", "tanh": "Tanh", "sqrt": "Sqrt",
    "sign": "Sign", "logistic": "Sigmoid", "floor": "Floor", "ceil": "Ceil", "pow": "Pow",
    "and": "And", "or": "Or", "xor": "Xor", "not": "Not",
}.items():
    _EMITTERS[_prim] = _elementwise(_op)


def _bool_via_int(arith: str):
    """OpenCV-DNN 5.0 rejects bool inputs in its nary-eltwise kernels, so
    lower bool logic through int32 arithmetic: And=Mul, Or=Max, Xor=|a-b|."""

    def fn(b: _Builder, eqn, ins):
        i32 = _onnx_dtype(np.dtype(np.int32))
        a = b.add1("Cast", [ins[0]], to=i32)
        c = b.add1("Cast", [ins[1]], to=i32)
        out = b.add1(arith, [a, c])
        if arith == "Sub":
            out = b.add1("Abs", [out])
        return b.add1("Cast", [out], to=_onnx_dtype(np.dtype(np.bool_)))

    return fn


_EMITTERS["and"] = _bool_via_int("Mul")
_EMITTERS["or"] = _bool_via_int("Max")
_EMITTERS["xor"] = _bool_via_int("Sub")


@_emit("rsqrt")
def _rsqrt(b, eqn, ins):
    return b.add1("Reciprocal", [b.add1("Sqrt", ins)])


@_emit("log1p")
def _log1p(b, eqn, ins):
    one = b.const(np.float32(1.0))
    return b.add1("Log", [b.add1("Add", [ins[0], one])])


@_emit("integer_pow")
def _integer_pow(b, eqn, ins):
    y = eqn.params["y"]
    if y == 2:
        return b.add1("Mul", [ins[0], ins[0]])
    exp = b.const(np.asarray(y, eqn.invars[0].aval.dtype))
    return b.add1("Pow", [ins[0], exp])


@_emit("rem")
def _rem(b, eqn, ins):
    return b.add1("Mod", ins, fmod=1)  # XLA rem truncates toward zero = C fmod


@_emit("eq")
def _eq(b, eqn, ins):
    return b.add1("Equal", ins)


@_emit("ne")
def _ne(b, eqn, ins):
    return b.add1("Not", [b.add1("Equal", ins)])


@_emit("lt")
def _lt(b, eqn, ins):
    return b.add1("Less", ins)


@_emit("le")
def _le(b, eqn, ins):
    return b.add1("LessOrEqual", ins)


@_emit("gt")
def _gt(b, eqn, ins):
    return b.add1("Greater", ins)


@_emit("ge")
def _ge(b, eqn, ins):
    return b.add1("GreaterOrEqual", ins)


@_emit("select_n")
def _select_n(b, eqn, ins):
    if len(ins) != 3:
        raise NotImplementedError("ONNX export: select_n with >2 cases")
    # select_n(pred, on_false, on_true); Where(cond, X=true-branch, Y=false-branch)
    return b.add1("Where", [ins[0], ins[2], ins[1]])


@_emit("convert_element_type")
def _convert(b, eqn, ins):
    return b.add1("Cast", ins, to=_onnx_dtype(eqn.params["new_dtype"]))


@_emit("stop_gradient", "optimization_barrier", "copy")
def _identity(b, eqn, ins):
    return [b.add1("Identity", [i]) for i in ins][: len(eqn.outvars)]


@_emit("reshape")
def _reshape(b, eqn, ins):
    shape = b.i64(eqn.outvars[0].aval.shape)
    return b.add1("Reshape", [ins[0], shape])


@_emit("squeeze")
def _squeeze(b, eqn, ins):
    shape = b.i64(eqn.outvars[0].aval.shape)
    return b.add1("Reshape", [ins[0], shape])


@_emit("expand_dims")
def _expand_dims(b, eqn, ins):
    shape = b.i64(eqn.outvars[0].aval.shape)
    return b.add1("Reshape", [ins[0], shape])


@_emit("transpose")
def _transpose(b, eqn, ins):
    return b.add1("Transpose", ins, perm=list(eqn.params["permutation"]))


@_emit("rev")
def _rev(b, eqn, ins):
    # lax.rev = flip along dims -> Slice with negative steps
    dims = list(eqn.params["dimensions"])
    starts = b.i64([-1] * len(dims))
    ends = b.i64([np.iinfo(np.int64).min] * len(dims))
    axes = b.i64(dims)
    steps = b.i64([-1] * len(dims))
    return b.add1("Slice", [ins[0], starts, ends, axes, steps])


@_emit("broadcast_in_dim")
def _broadcast_in_dim(b, eqn, ins):
    target = list(eqn.params["shape"])
    bcast_dims = list(eqn.params["broadcast_dimensions"])
    in_shape = tuple(eqn.invars[0].aval.shape)
    mid = [1] * len(target)
    for src, dst in enumerate(bcast_dims):
        mid[dst] = in_shape[src]
    x = ins[0]
    if tuple(mid) != in_shape:
        x = b.add1("Reshape", [x, b.i64(mid)])
    if mid == target:
        return x
    return b.add1("Expand", [x, b.i64(target)])


@_emit("concatenate")
def _concatenate(b, eqn, ins):
    return b.add1("Concat", ins, axis=int(eqn.params["dimension"]))


@_emit("slice")
def _slice(b, eqn, ins):
    starts = list(eqn.params["start_indices"])
    ends = list(eqn.params["limit_indices"])
    strides = eqn.params["strides"] or [1] * len(starts)
    axes = list(range(len(starts)))
    return b.add1(
        "Slice",
        [ins[0], b.i64(starts), b.i64(ends), b.i64(axes), b.i64(list(strides))],
    )


@_emit("split")
def _split(b, eqn, ins):
    sizes = [int(s) for s in eqn.params["sizes"]]
    return b.add("Split", ins, n_out=len(sizes), axis=int(eqn.params["axis"]), split=sizes)


@_emit("pad")
def _pad(b, eqn, ins):
    config = eqn.params["padding_config"]
    if any(interior != 0 for _, _, interior in config):
        raise NotImplementedError("ONNX export: interior padding")
    if any(lo < 0 or hi < 0 for lo, hi, _ in config):
        raise NotImplementedError("ONNX export: negative padding")
    pads = [lo for lo, _, _ in config] + [hi for _, hi, _ in config]
    return b.add1("Pad", [ins[0], b.i64(pads), ins[1]], mode="constant")


def _reduce(op: str):
    def fn(b: _Builder, eqn, ins):
        axes = [int(a) for a in eqn.params["axes"]]
        return b.add1(op, ins, axes=axes, keepdims=0)

    return fn


_EMITTERS["reduce_sum"] = _reduce("ReduceSum")
_EMITTERS["reduce_max"] = _reduce("ReduceMax")
_EMITTERS["reduce_min"] = _reduce("ReduceMin")
_EMITTERS["reduce_prod"] = _reduce("ReduceProd")


@_emit("argmax")
def _argmax(b, eqn, ins):
    axes = eqn.params["axes"]
    if len(axes) != 1:
        raise NotImplementedError("ONNX export: multi-axis argmax")
    out = b.add1("ArgMax", ins, axis=int(axes[0]), keepdims=0)
    dt = _onnx_dtype(eqn.outvars[0].aval.dtype)
    return out if dt == 7 else b.add1("Cast", [out], to=dt)


@_emit("top_k")
def _top_k(b, eqn, ins):
    """lax.top_k (last axis, sorted, largest) -> ONNX TopK-11. The indices
    output casts back to int32 (lax contract; ONNX TopK emits int64)."""
    k = int(eqn.params["k"])
    vals, idxs = b.add(
        "TopK", [ins[0], b.const(np.array([k], np.int64), "k")],
        n_out=2, hint="topk", axis=-1, largest=1, sorted=1,
    )
    return [vals, b.add1("Cast", [idxs], to=_onnx_dtype(np.dtype(np.int32)))]


@_emit("iota")
def _iota(b, eqn, ins):
    # normally constant-folded; emit directly for safety
    dim = eqn.params["dimension"]
    shape = eqn.params["shape"]
    dtype = eqn.params["dtype"]
    vec = np.arange(shape[dim], dtype=dtype)
    arr = np.broadcast_to(vec.reshape([-1 if i == dim else 1 for i in range(len(shape))]), shape)
    return b.const(np.ascontiguousarray(arr), "iota")


@_emit("conv_general_dilated")
def _conv(b, eqn, ins):
    p = eqn.params
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    n_spatial = len(lhs_spec) - 2
    x = ins[0]
    lhs_perm = _perm_to_nchw(lhs_spec)
    if lhs_perm != list(range(len(lhs_spec))):
        x = b.add1("Transpose", [x], perm=lhs_perm)
    if any(d != 1 for d in p["lhs_dilation"]):
        # transposed conv (lax.conv_transpose lowers to an lhs-dilated conv):
        # materialize the zero-insertion explicitly — unsqueeze each spatial
        # dim, pad the new axis to the dilation factor, flatten, trim the
        # trailing zeros — then run a regular Conv. Exact lhs_dilation
        # semantics; runs once per forward in the Proto head, so the extra
        # reshape ops are free in practice.
        in_shape = list(eqn.invars[0].aval.shape)
        nchw_shape = [in_shape[i] for i in lhs_perm]
        cur = nchw_shape[:2] + [nchw_shape[2 + i] for i in range(n_spatial)]
        for i, d in enumerate(p["lhs_dilation"]):
            if d == 1:
                continue
            axis = 2 + i
            h = cur[axis]
            # (..., H, ...) -> (..., H, 1, ...) -> pad -> (..., H, d, ...) -> (..., H*d, ...)
            unsq = cur[:axis + 1] + [1] + cur[axis + 1:]
            x = b.add1("Reshape", [x, b.i64(unsq, "unsq")])
            rank = len(unsq)
            pads = [0] * rank + [0] * rank
            pads[rank + axis + 1] = d - 1  # end-pad the inserted axis
            x = b.add1("Pad", [x, b.const(np.array(pads, np.int64), "pads"),
                               b.const(np.zeros((), eqn.invars[0].aval.dtype), "zero")])
            cur = cur[:axis] + [h * d] + cur[axis + 1:]
            x = b.add1("Reshape", [x, b.i64(cur, "dil")])
            # trim the (d-1) trailing zeros so the size is (H-1)*d + 1
            starts = [0] * len(cur)
            ends = list(cur)
            ends[axis] = (h - 1) * d + 1
            x = b.add1(
                "Slice",
                [x, b.const(np.array(starts, np.int64), "st"),
                 b.const(np.array(ends, np.int64), "en")],
            )
            cur[axis] = (h - 1) * d + 1
    w = ins[1]
    rhs_perm = _perm_to_nchw(rhs_spec)  # -> (O, I, *spatial)
    if rhs_perm != list(range(len(rhs_spec))):
        w = b.add1("Transpose", [w], perm=rhs_perm)
    pads_cfg = p["padding"]
    pads = [lo for lo, _ in pads_cfg] + [hi for _, hi in pads_cfg]
    y = b.add1(
        "Conv",
        [x, w],
        strides=[int(s) for s in p["window_strides"]],
        pads=[int(v) for v in pads],
        dilations=[int(d) for d in p["rhs_dilation"]],
        group=int(p["feature_group_count"]),
    )
    # conv output is (N, C, *spatial) at positions (0, 1, 2...); place back per out_spec
    out_perm = _inv_perm(_perm_to_nchw(out_spec))
    if out_perm != list(range(n_spatial + 2)):
        y = b.add1("Transpose", [y], perm=out_perm)
    return y


@_emit("reduce_window_max")
def _maxpool(b, eqn, ins):
    p = eqn.params
    window = list(p["window_dimensions"])
    strides = list(p["window_strides"])
    padding = list(p["padding"])
    if any(d != 1 for d in p.get("base_dilation", [1] * len(window))):
        raise NotImplementedError("ONNX export: dilated-base pooling")
    if any(d != 1 for d in p.get("window_dilation", [1] * len(window))):
        raise NotImplementedError("ONNX export: dilated-window pooling")
    rank = len(window)
    spatial = [i for i in range(rank) if window[i] != 1 or strides[i] != 1 or padding[i] != (0, 0)]
    passive = [i for i in range(rank) if i not in spatial]
    if not spatial:
        return b.add1("Identity", ins)
    if len(passive) < 2:
        raise NotImplementedError("ONNX export: pooling without batch/channel dims")
    # treat first two passive dims as N, C; everything in `spatial` pools
    n, c = passive[0], passive[1]
    extra_passive = passive[2:]
    if extra_passive:
        spatial = spatial + extra_passive  # pool with window 1 on leftovers
    perm = [n, c, *spatial]
    x = b.add1("Transpose", ins, perm=perm) if perm != list(range(rank)) else ins[0]
    pads = [padding[i][0] for i in spatial] + [padding[i][1] for i in spatial]
    y = b.add1(
        "MaxPool",
        [x],
        kernel_shape=[window[i] for i in spatial],
        strides=[strides[i] for i in spatial],
        pads=pads,
    )
    inv = _inv_perm(perm)
    return b.add1("Transpose", [y], perm=inv) if inv != list(range(rank)) else y


@_emit("gather")
def _gather(b, eqn, ins):
    """Two supported gather families:

    1. Dynamic batched row-gathers (jnp.take_along_axis over a leading-batch
       operand — the v10 decode's top-k row selection, postprocess.py:46-56)
       lower to ONNX GatherND(batch_dims=b) (opset 12).
    2. Constant-index gathers whose index grid is a regular stride pattern
       (strided spatial slicing: space_to_depth / Focus / `x[:, ::2, ::2]`)
       lower to ONNX Slice with steps — the form every importer supports."""
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
        idx64 = b.add1("Cast", [ins[1]], to=_onnx_dtype(np.dtype(np.int64)))
        return b.add1("GatherND", [ins[0], idx64], batch_dims=nb)
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
        # batching dims): ONNX Gather(axis=d) with 1-D indices
        d = int(dn.start_index_map[0])
        idx64 = b.add1("Cast", [ins[1]], to=_onnx_dtype(np.dtype(np.int64)))
        flat = b.add1("Reshape", [idx64, b.i64([idx_shape[0]])])
        return b.add1("Gather", [ins[0], flat], axis=d)
    kind, idx = b._conv.read(eqn.invars[1])
    if kind != "const":
        raise NotImplementedError("ONNX export: gather with non-constant indices")
    idx = np.asarray(idx)
    dims = tuple(dn.start_index_map)
    k = idx.shape[-1]
    if (
        tuple(dn.collapsed_slice_dims) != dims
        or tuple(sorted(dims)) != dims
        or idx.ndim != k + 1
        or any(p["slice_sizes"][d] != (1 if d in dims else operand_shape[d]) for d in range(len(operand_shape)))
    ):
        raise NotImplementedError("ONNX export: general gather (only strided-slice patterns)")
    # offset_dims must be the positions of the non-collapsed operand dims,
    # with index batch dims sitting exactly where the collapsed dims were
    expect_offsets = [d for d in range(len(operand_shape)) if d not in dims]
    if tuple(dn.offset_dims) != tuple(expect_offsets):
        raise NotImplementedError("ONNX export: gather with permuted output dims")
    starts, ends, steps = [], [], []
    for comp_axis, d in enumerate(dims):
        comp = idx[..., comp_axis]
        n = comp.shape[comp_axis]
        base = comp[tuple(slice(0, 1) if ax != comp_axis else slice(None) for ax in range(comp.ndim))].reshape(n)
        step = int(base[1] - base[0]) if n > 1 else 1
        if n > 1 and not np.all(np.diff(base) == step):
            raise NotImplementedError("ONNX export: gather with irregular stride")
        full = np.broadcast_to(
            base.reshape([n if ax == comp_axis else 1 for ax in range(comp.ndim)]), comp.shape
        )
        if not np.array_equal(comp, full):
            raise NotImplementedError("ONNX export: gather index varies across other axes")
        start = int(base[0])
        starts.append(start)
        steps.append(step if step != 0 else 1)
        ends.append(start + step * n if step > 0 else start + step * n)
    return b.add1(
        "Slice",
        [ins[0], b.i64(starts), b.i64(ends), b.i64(list(dims)), b.i64(steps)],
    )


@_emit("dot_general")
def _dot_general(b, eqn, ins):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs_shape = tuple(eqn.invars[0].aval.shape)
    rhs_shape = tuple(eqn.invars[1].aval.shape)
    lf = [i for i in range(len(lhs_shape)) if i not in lc and i not in lb]
    rf = [i for i in range(len(rhs_shape)) if i not in rc and i not in rb]

    def prep(name, shape, batch, free, contract, contract_last):
        order = list(batch) + (list(free) + list(contract) if contract_last else list(contract) + list(free))
        x = b.add1("Transpose", [name], perm=order) if order != list(range(len(shape))) else name
        bshape = [shape[i] for i in batch]
        fsz = int(np.prod([shape[i] for i in free])) if free else 1
        csz = int(np.prod([shape[i] for i in contract])) if contract else 1
        new = bshape + ([fsz, csz] if contract_last else [csz, fsz])
        return b.add1("Reshape", [x, b.i64(new)])

    lhs2 = prep(ins[0], lhs_shape, lb, lf, lc, contract_last=True)
    rhs2 = prep(ins[1], rhs_shape, rb, rf, rc, contract_last=False)
    y = b.add1("MatMul", [lhs2, rhs2])
    out_shape = list(eqn.outvars[0].aval.shape)
    return b.add1("Reshape", [y, b.i64(out_shape)])


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def export_onnx(
    fn,
    example_args: Sequence[Any],
    path: str,
    input_names: Optional[Sequence[str]] = None,
    output_names: Optional[Sequence[str]] = None,
    graph_name: str = "lpc_yolo_tpu",
) -> str:
    """Trace `fn(*example_args)` and write an ONNX model to `path`.

    `example_args` may be arrays or jax.ShapeDtypeStructs (static shapes,
    fp32/ints only — bf16 models should be exported from an fp32 build).
    """
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    b = _Builder()
    conv = _Converter(b)

    flat_in = jaxpr.invars
    input_names = list(input_names or [f"input_{i}" for i in range(len(flat_in))])
    if len(input_names) != len(flat_in):
        raise ValueError(f"expected {len(flat_in)} input names, got {len(input_names)}")
    in_infos = []
    for name, var in zip(input_names, flat_in):
        in_infos.append(_value_info(name, var.aval.shape, var.aval.dtype))
    conv.run(jaxpr, closed.consts, [("tensor", n) for n in input_names])

    out_vars = jaxpr.outvars
    output_names = list(output_names or [f"output_{i}" for i in range(len(out_vars))])
    if len(output_names) != len(out_vars):
        raise ValueError(f"expected {len(out_vars)} output names, got {len(output_names)}")
    out_infos = []
    for name, var in zip(output_names, out_vars):
        kind, val = conv.read(var)
        if kind == "const":  # output is fully constant-folded
            src = b.const(val, "const_out")
            b.nodes.append(_node_proto("Identity", [src], [name], b.fresh("n_Identity"), {}))
        else:
            b.nodes.append(_node_proto("Identity", [val], [name], b.fresh("n_Identity"), {}))
        out_infos.append(_value_info(name, var.aval.shape, var.aval.dtype))

    blob = _model_proto(b.nodes, b.initializers, in_infos, out_infos, graph_name)
    with open(path, "wb") as f:
        f.write(blob)
    return path
