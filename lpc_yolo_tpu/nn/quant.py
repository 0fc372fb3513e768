"""Post-training int8 quantization for the deploy serving graph.

TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS vs
197 TFLOP/s), and `tools/int8_probe.py` measured XLA:TPU lowering int8
`lax.conv_general_dilated` onto that path at 1.65-1.83x bf16 wall-clock on
the FLOP-dominant 3x3 serving shapes (1.0-1.4x for the small 1x1s). This
module adds the standard PTQ scheme on top of the deploy graph rewrites:

  * per-output-channel symmetric int8 weights (scales from the BN-FOLDED
    kernel at trace time — quantization composes with every deploy kernel
    rewrite: BN fold, C2f kernel algebra, upsample-commute row splits);
  * per-tensor symmetric int8 activations, scales calibrated by running
    the same graph in RECORD mode over representative batches (absmax,
    reduced with max across batches) — the jitted record pass returns all
    site ranges as one stacked vector, so calibration runs at full device
    speed (no eager per-op dispatch);
  * int32 accumulation, dequantize (sx * sw[c]) -> bf16 + bias + act.
    Activations between layers stay bf16: when a tensor's only consumer
    is the next conv, XLA fuses the requantize into the producer's
    epilogue and the tensor crosses HBM as int8 anyway (half bandwidth);
    shared tensors (CSP fan-out) are quantized once per scale (CSE).

Reference parity note: the torch reference deploys int8 through TensorRT /
TFLite calibration (engine/exporter.py `int8` flag + representative
dataset); this is the same PTQ contract executed natively on the TPU
serving graph. Head towers stay bf16 (accuracy headroom — they are <8% of
FLOPs); convs with tiny channel counts, groups, or dilation stay bf16
(no MXU win; see `_site_eligible`).

Usage:
    model  = build_model(cfg, dtype=jnp.bfloat16, deploy=True)
    scales = calibrate_int8(model, variables, batches)          # record pass
    qmodel = build_model(cfg, dtype=jnp.bfloat16, deploy=True,
                         quant="int8", quant_scales=scales)     # int8 serving
"""

import contextvars
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp


class QuantCtx:
    """Trace-time state for the int8 deploy pass.

    Exactly one of (record, scales) is set. Site keys are the call-sequence
    counter: the record pass and the quantized pass trace the SAME deploy
    graph code path, so sites align by construction.
    """

    def __init__(self, scales: Optional[Tuple[float, ...]] = None, record: bool = False):
        self.scales = scales
        self.record: Optional[List[jnp.ndarray]] = [] if record else None
        self.n = 0

    def next_key(self) -> int:
        k = self.n
        self.n += 1
        return k


DEPLOY_INT8: contextvars.ContextVar[Optional[QuantCtx]] = contextvars.ContextVar(
    "lpc_deploy_int8", default=None
)


def suspend() -> None:
    """Turn quantization off for the rest of the current trace (the head)."""
    if DEPLOY_INT8.get() is not None:
        DEPLOY_INT8.set(None)


class suspended:
    """Scoped variant of suspend(): quantization is off inside the `with`
    block and restored after. Lets the v10 head quantize its tower
    intermediates while the final box/cls PROJECTIONS (the DFL and logit
    layers — the accuracy-critical outputs) stay bf16. Runs identically in
    the record and quantized traces, so site keys stay aligned."""

    def __enter__(self):
        self._tok = DEPLOY_INT8.set(None)
        return self

    def __exit__(self, *exc):
        DEPLOY_INT8.reset(self._tok)
        return False


def _site_eligible(x, W, groups: int, rhs_dilation) -> bool:
    cin, cout = W.shape[-2], W.shape[-1]
    return (
        groups == 1
        and tuple(rhs_dilation) == (1, 1)
        and jnp.issubdtype(x.dtype, jnp.floating)
        and min(cin, cout) >= 64  # probe: int8 wins at >=64ch; tiny convs are latency-bound
    )


def q8_conv(x, W, strides, padding, *, groups: int = 1, rhs_dilation=(1, 1)):
    """Deploy-path conv that runs on the int8 MXU path when a QuantCtx is
    active (otherwise the caller's original bf16 conv). W is the BN-folded
    (possibly algebra-rewritten) kernel. Returns the UN-activated, UN-biased
    conv output in x's compute dtype — callers keep their own +b / act / sum
    epilogues, which is what lets the C2f kernel-algebra paths share this.
    """
    ctx = DEPLOY_INT8.get()
    dims = ("NHWC", "HWIO", "NHWC")
    if ctx is None or not _site_eligible(x, W, groups, rhs_dilation):
        return jax.lax.conv_general_dilated(
            x, jax.lax.optimization_barrier(W), strides, padding,
            rhs_dilation=tuple(rhs_dilation), dimension_numbers=dims,
            feature_group_count=groups,
        )
    key = ctx.next_key()
    if ctx.record is not None:
        # record pass: bf16 math, plus this site's input range as a traced
        # scalar (stacked and returned by calibrate_int8's jitted fn)
        ctx.record.append(jnp.max(jnp.abs(x)).astype(jnp.float32))
        return jax.lax.conv_general_dilated(
            x, jax.lax.optimization_barrier(W), strides, padding,
            dimension_numbers=dims,
        )
    if ctx.scales is None or key >= len(ctx.scales):
        raise ValueError(
            f"int8 deploy graph needs calibrated scales for site {key} "
            f"(got {0 if ctx.scales is None else len(ctx.scales)}); run "
            "calibrate_int8() on representative batches first"
        )
    sx = max(float(ctx.scales[key]), 1e-12) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / sx)), -127, 127).astype(jnp.int8)
    Wf = W.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(Wf), axis=(0, 1, 2)), 1e-12) / 127.0  # (cout,)
    W8 = jnp.round(Wf / sw).astype(jnp.int8)
    y32 = jax.lax.conv_general_dilated(
        x8, jax.lax.optimization_barrier(W8), strides, padding,
        dimension_numbers=dims, preferred_element_type=jnp.int32,
    )
    return (y32.astype(jnp.float32) * (sx * sw)).astype(x.dtype)


def _quantize_parts(parts, sx):
    inv = 1.0 / sx
    return [
        jnp.clip(jnp.round(p.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)
        for p in parts
    ]


def q8_concat_conv(parts, W, strides=(1, 1), padding=((0, 0), (0, 0))):
    """concat(parts, -1) -> conv, with the concat in the s8 DOMAIN when an
    int8 QuantCtx is active. One shared per-tensor scale covers every part
    (the site records absmax over the whole concat), so each producer's
    epilogue writes an s8 part (1 B/elem) and the wide bf16 concat tensor —
    the dominant requantize cost in the CSP tails, xplane-profiled at ~3
    ms/step on v10x b32 — never materializes. Exact fallback to
    conv(concat(parts)) when quantization is off or the site is ineligible.
    """
    dims = ("NHWC", "HWIO", "NHWC")
    ctx = DEPLOY_INT8.get()
    if ctx is None or not _site_eligible(parts[0], W, 1, (1, 1)):
        return jax.lax.conv_general_dilated(
            jnp.concatenate(parts, axis=-1), jax.lax.optimization_barrier(W),
            strides, padding, dimension_numbers=dims,
        )
    key = ctx.next_key()
    if ctx.record is not None:
        ctx.record.append(
            jnp.max(jnp.stack([jnp.max(jnp.abs(p)) for p in parts])).astype(jnp.float32)
        )
        return jax.lax.conv_general_dilated(
            jnp.concatenate(parts, axis=-1), jax.lax.optimization_barrier(W),
            strides, padding, dimension_numbers=dims,
        )
    if ctx.scales is None or key >= len(ctx.scales):
        raise ValueError(
            f"int8 deploy graph needs calibrated scales for site {key} "
            f"(got {0 if ctx.scales is None else len(ctx.scales)}); run "
            "calibrate_int8() on representative batches first"
        )
    sx = max(float(ctx.scales[key]), 1e-12) / 127.0
    x8 = jnp.concatenate(_quantize_parts(parts, sx), axis=-1)
    Wf = W.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(Wf), axis=(0, 1, 2)), 1e-12) / 127.0
    W8 = jnp.round(Wf / sw).astype(jnp.int8)
    y32 = jax.lax.conv_general_dilated(
        x8, jax.lax.optimization_barrier(W8), strides, padding,
        dimension_numbers=dims, preferred_element_type=jnp.int32,
    )
    return (y32.astype(jnp.float32) * (sx * sw)).astype(parts[0].dtype)


def q8_pool_concat_conv(x, W, k: int, n_pools: int = 3):
    """The SPPF tail — concat([x, pool(x), ..., pool^n(x)]) -> 1x1 conv —
    with the POOLS AND CONCAT in the s8 domain when an int8 QuantCtx is
    active. Quantization commutes with max-pool exactly (round/clip are
    monotonic and pooling only selects elements), so one quantize of x
    covers all branches, absmax(concat) == absmax(x) by the same argument,
    and the chain's HBM traffic halves vs bf16 pools.
    """
    p = k // 2
    ctx = DEPLOY_INT8.get()
    dims = ("NHWC", "HWIO", "NHWC")

    def pool(t, init):
        return jax.lax.reduce_window(
            t, init, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
            [(0, 0), (p, p), (p, p), (0, 0)],
        )

    if ctx is None or not _site_eligible(x, W, 1, (1, 1)):
        neg = jnp.array(-jnp.inf, x.dtype)
        ys = [x]
        for _ in range(n_pools):
            ys.append(pool(ys[-1], neg))
        return jax.lax.conv_general_dilated(
            jnp.concatenate(ys, axis=-1), jax.lax.optimization_barrier(W),
            (1, 1), [(0, 0), (0, 0)], dimension_numbers=dims,
        )
    key = ctx.next_key()
    if ctx.record is not None:
        ctx.record.append(jnp.max(jnp.abs(x)).astype(jnp.float32))
        neg = jnp.array(-jnp.inf, x.dtype)
        ys = [x]
        for _ in range(n_pools):
            ys.append(pool(ys[-1], neg))
        return jax.lax.conv_general_dilated(
            jnp.concatenate(ys, axis=-1), jax.lax.optimization_barrier(W),
            (1, 1), [(0, 0), (0, 0)], dimension_numbers=dims,
        )
    if ctx.scales is None or key >= len(ctx.scales):
        raise ValueError(
            f"int8 deploy graph needs calibrated scales for site {key} "
            f"(got {0 if ctx.scales is None else len(ctx.scales)})"
        )
    sx = max(float(ctx.scales[key]), 1e-12) / 127.0
    (x8,) = _quantize_parts([x], sx)
    ys = [x8]
    for _ in range(n_pools):
        ys.append(pool(ys[-1], jnp.array(-128, jnp.int8)))
    Wf = W.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(Wf), axis=(0, 1, 2)), 1e-12) / 127.0
    W8 = jnp.round(Wf / sw).astype(jnp.int8)
    y32 = jax.lax.conv_general_dilated(
        jnp.concatenate(ys, axis=-1), jax.lax.optimization_barrier(W8),
        (1, 1), [(0, 0), (0, 0)], dimension_numbers=dims,
        preferred_element_type=jnp.int32,
    )
    return (y32.astype(jnp.float32) * (sx * sw)).astype(x.dtype)


def calibrate_serving(model, variables, batches_u8, bgr: bool = True):
    """Calibrate per-site activation scales against the WPACK uint8 serving
    graph — the EXACT trace Predictor/Validator serve (fold_preprocess'd
    variables, width-packed uint8 feed, predict_only). Site keys align with
    the quantized serving pass by construction: both trace the same code.

    Args:
        model: a DetectionModel (any deploy/quant state; a clean deploy clone
            is made internally).
        batches_u8: list of (B, H, W/8, 24) uint8 arrays (letterboxed,
            width-packed). Use the SAME batch size as serving: the width-pack
            planner is batch-aware, and a different plan changes the site
            sequence.

    Returns per-site scales (tuple of floats) for build_model(quant="int8").
    """
    base = model.clone(deploy=True, quant="", quant_scales=())

    @jax.jit
    def _record(v, imgs_u8):
        ctx = QuantCtx(record=True)
        token = DEPLOY_INT8.set(ctx)
        try:
            if getattr(base, "specs", None) and base.specs[0].module == "Conv":
                from .fuse import fold_preprocess

                v = fold_preprocess(v, bgr=bgr)
                x = imgs_u8.astype(base.dtype)
            else:
                from ..ops.letterbox import device_preprocess_wpack

                x = device_preprocess_wpack(imgs_u8, bgr=bgr)
            base.apply(v, x, training=False, predict_only=True, input_layout="WPACK")
        finally:
            DEPLOY_INT8.reset(token)
        if not ctx.record:
            raise ValueError("no quantizable conv sites found in the deploy graph")
        return jnp.stack(ctx.record)

    per_batch = [_record(variables, jnp.asarray(b)) for b in batches_u8]
    ranges = jnp.max(jnp.stack(per_batch), axis=0)
    return tuple(float(r) for r in ranges)


def calibrate_int8(model, variables, batches, **apply_kwargs):
    """Run the deploy graph in record mode over `batches` (a list of input
    arrays shaped like the serving input) and return the per-site activation
    ranges as a tuple of floats (max over batches of per-batch absmax).

    The record pass is jitted: all site ranges come back as ONE stacked
    vector per batch, so calibration costs one serving forward per batch.
    """
    apply_kwargs.setdefault("training", False)
    apply_kwargs.setdefault("predict_only", True)

    @jax.jit
    def _record(v, x):
        ctx = QuantCtx(record=True)
        token = DEPLOY_INT8.set(ctx)
        try:
            model.apply(v, x, **apply_kwargs)
        finally:
            DEPLOY_INT8.reset(token)
        if not ctx.record:
            raise ValueError("no quantizable conv sites found in the deploy graph")
        return jnp.stack(ctx.record)

    per_batch = [_record(variables, b) for b in batches]
    ranges = jnp.max(jnp.stack(per_batch), axis=0)
    return tuple(float(r) for r in ranges)
