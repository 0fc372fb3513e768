"""NHWC flax.linen block zoo for the YAML->graph compiler.

Behavioral spec: reference ultralytics/nn/modules/conv.py (Conv/DWConv/Concat),
block.py (C2f:214, SPPF:156, Bottleneck, RepVGGDW:700, CIB:735, C2fCIB:758,
Attention:769, PSA:797, SCDown:818, CBAM:2625, space_to_depth:4063,
SPCA:5725, C2f_SPCA:5752, SPDConv:5777, LPC:5801). Re-designed TPU-first:

  * NHWC activations, HWIO kernels — XLA's native TPU conv layout.
  * BatchNorm folded into conv at inference by a pure params transform
    (see fuse.py), so the hot path is conv+SiLU only.
  * All control flow static; channel arithmetic happens at build time.

Submodule names mirror the reference's attribute paths (cv1, m0, ...) so the
torch->JAX weight porter is a pure name map.

Activation subtlety (discovered by train-mode parity testing): the fork's
block.py re-defines `Conv` with a Mish activation at block.py:4914 (inside a
pasted GSConv section), shadowing conv.py's SiLU Conv for every block class
defined in block.py (C2f, SPPF, SCDown, CIB, PSA, LPC, ...). YAML-level `Conv`
layers, conv.py modules (DWConv/Focus/GhostConv) and the head towers keep
SiLU. The act defaults below reproduce exactly that behavior.
"""

from __future__ import annotations

import contextvars
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .quant import q8_concat_conv, q8_conv, q8_pool_concat_conv

# Trace-time flag set by DetectionModel on the deploy inference path: every
# ConvBN folds its BN into the kernel inline (W*f, b-mean*f) and runs
# conv+bias+act as ONE bf16 chain. Without this, inference BN is a separate
# (internally f32) elementwise op that XLA cannot fuse into the conv
# epilogue — profiled cost: a layout round-trip copy pair per stem conv
# (~3.4 ms of pure copies on v10n b32).
DEPLOY_MATH = contextvars.ContextVar("lpc_deploy_math", default=False)
# Model-wide default activation for conv.py-family Convs (YAML `activation:` key)
DEFAULT_ACT = contextvars.ContextVar("lpc_default_act", default="silu")

# Matches reference initialize_weights (torch_utils.py:342-352): BN eps=1e-3,
# momentum=0.03 (flax momentum = 1 - torch momentum).
BN_EPS = 1e-3
BN_MOMENTUM = 0.97

KernelInit = Callable[..., jnp.ndarray]


def kaiming_uniform() -> KernelInit:
    """torch Conv2d default init (kaiming_uniform with a=sqrt(5)) for HWIO kernels."""

    def init(key, shape, dtype=jnp.float32):
        # fan_in = prod of all but the output (last) dim — works for HWIO conv
        # kernels and (in, out) dense kernels alike
        fan_in = 1
        for d in shape[:-1]:
            fan_in *= d
        bound = 1.0 / math.sqrt(fan_in) * math.sqrt(3.0) * math.sqrt(2.0 / (1 + 5.0))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """'same'-style symmetric padding (reference conv.py:27-33)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm + activation — the reference `Conv` block.

    Symmetric explicit padding (k//2 per side) to match torch semantics; XLA
    'SAME' pads asymmetrically under stride 2 and would shift feature maps.
    """

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Any = "silu"  # 'silu' | 'mish' | True (silu) | False/'none'
    pack_in: int = 1  # width-pack factor of the input (deploy serving layout)
    pack_out: int = 1  # width-pack factor of the output
    s2d_in: bool = False  # deploy: input is the PRE-space_to_depth map (fold)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        kh, kw = (self.k, self.k) if isinstance(self.k, int) else tuple(self.k)
        ph, pw = autopad(kh, self.p, self.d), autopad(kw, self.p, self.d)
        if not training and DEPLOY_MATH.get():
            packed = self.pack_in > 1 or self.pack_out > 1
            cin = x.shape[-1]
            if packed:
                cin = cin // self.pack_in
            if self.s2d_in:
                # kernel stays declared against the s2d OUTPUT (4C rows) —
                # same variable tree as the training graph, which runs the
                # s2d layer normally; the fold is a trace-time rearrange
                cin = cin * 4
            w = _Kernel((kh, kw, cin // self.g, self.c2), name="conv")()
            scale, bias, mean, var = _BN(self.c2, name="bn")()
            f = scale * jax.lax.rsqrt(var + BN_EPS)
            W = (w * f).astype(self.dtype)
            b = (bias - mean * f).astype(self.dtype)
            if self.s2d_in:
                assert self.g == 1 and self.d == 1 and kh == kw and ph == kh // 2
                W = s2d_fold_kernel(W)
                pad = (2 * ph, 2 * kh - 2 - 2 * ph)
                if packed:
                    return packed_conv(
                        x, W, 2 * self.s, self.pack_in, self.pack_out,
                        b=b, act=self.act, pl=pad[0], ph=pad,
                    )
                y = q8_conv(x, W, (2 * self.s, 2 * self.s), [pad, pad])
                return apply_act(y + b, self.act)
            if packed:
                assert self.g == 1 and self.d == 1 and kh == kw
                return packed_conv(x, W, self.s, self.pack_in, self.pack_out, b=b, act=self.act)
            y = q8_conv(
                x, W, (self.s, self.s), [(ph, ph), (pw, pw)],
                groups=self.g, rhs_dilation=(self.d, self.d),
            )
            return apply_act(y + b, self.act)
        if self.s2d_in and not (self.pack_in > 1 or self.pack_out > 1):
            # TRAINING-graph space_to_depth fold (same variable tree as the
            # unfolded graph): conv the PRE-s2d map with the rearranged RAW
            # kernel (s2d_fold_kernel: kxk/4C -> 2kx2k/C at stride 2), then
            # LIVE BatchNorm. The conv output is bit-identical to
            # s2d -> conv, so BN statistics and gradients match the unfolded
            # graph exactly while the s2d relayout (two big HBM round-trips
            # per site, fwd + bwd) never materializes. Deploy serving uses
            # the BN-folded version of the same rewrite above.
            assert self.g == 1 and self.d == 1 and kh == kw and ph == kh // 2
            cin4 = x.shape[-1] * 4
            w = _Kernel((kh, kw, cin4, self.c2), name="conv")()
            W2 = s2d_fold_kernel(w).astype(self.dtype)
            pad = (2 * ph, 2 * kh - 2 - 2 * ph)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), W2, (2 * self.s, 2 * self.s), [pad, pad],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = nn.BatchNorm(
                use_running_average=not training, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, dtype=self.dtype, name="bn",
            )(y)
            return apply_act(y, self.act)
        if self.pack_in > 1 or self.pack_out > 1:
            # training-path width packing: the conv runs via packed_conv on
            # the RAW kernel (no BN fold — training needs live statistics),
            # then PackedBN reproduces flax BatchNorm exactly on the packed
            # layout. Same variable tree as the plain path (conv/kernel,
            # bn/{scale,bias,mean,var}), so checkpoints/EMA/fusion are
            # unaffected. Only 'same'-padded ungrouped square convs are
            # planned (compiler._wpack_out).
            assert self.g == 1 and self.d == 1 and kh == kw
            if self.s2d_in:
                # packed TRAINING s2d fold: conv the PACKED pre-s2d map with
                # the rearranged RAW kernel at 2x stride (exact, same as the
                # unpacked fold above), then PackedBN for live statistics.
                # Keeps the width-pack chain unbroken across the LPC stage
                # boundaries — the pack<->unpack relayouts at the 4 fold
                # sites were ~16% of the LPC train step (xplane, b32).
                assert ph == kh // 2
                cin4 = (x.shape[-1] // self.pack_in) * 4
                w = _Kernel((kh, kw, cin4, self.c2), name="conv")()
                W2 = s2d_fold_kernel(w).astype(self.dtype)
                pad = (2 * ph, 2 * kh - 2 - 2 * ph)
                y = packed_conv(x.astype(self.dtype), W2, 2 * self.s,
                                self.pack_in, self.pack_out, pl=pad[0], ph=pad)
            else:
                cin = x.shape[-1] // self.pack_in
                w = _Kernel((kh, kw, cin, self.c2), name="conv")().astype(self.dtype)
                y = packed_conv(x.astype(self.dtype), w, self.s, self.pack_in, self.pack_out)
            y = PackedBN(self.c2, self.pack_out, dtype=self.dtype, name="bn")(y, training)
            return apply_act(y, self.act)
        x = nn.Conv(
            self.c2,
            (kh, kw),
            strides=(self.s, self.s),
            padding=[(ph, ph), (pw, pw)],
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            kernel_init=kaiming_uniform(),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not training,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        return apply_act(x, self.act)


def mish(x):
    """Mish activation: x * tanh(softplus(x))."""
    return x * jnp.tanh(jax.nn.softplus(x))


def apply_act(x, act):
    if act in (True, "silu"):
        # conv.py-family default activation: overridable by the model YAML's
        # `activation:` key (reference tasks.py sets Conv.default_act), e.g.
        # yolov6's nn.ReLU(). block.py-family modules pass "mish" explicitly
        # (the fork's Conv shadow) and are unaffected — same as the reference.
        act = DEFAULT_ACT.get()
        if act == "relu":
            return nn.relu(x)
        return nn.silu(x)
    if act == "mish":
        return mish(x)
    if act == "relu":
        return nn.relu(x)
    if act == "gelu":
        return nn.gelu(x)
    return x


class DWConv(ConvBN):
    """Depthwise conv: groups = gcd(c1, c2); caller sets g at build time."""


class Bottleneck(nn.Module):
    """Standard bottleneck (reference block.py Bottleneck): cv1 kxk -> cv2 kxk (+residual)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    act: Any = "mish"  # block.py-defined blocks resolve the fork's Mish Conv
    pack: int = 1  # width-pack factor (training-path packing; in == out)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBN(c_, self.k[0], 1, act=self.act, pack_in=self.pack, pack_out=self.pack,
                   dtype=self.dtype, name="cv1")(x, training)
        y = ConvBN(self.c2, self.k[1], 1, g=self.g, act=self.act, pack_in=self.pack,
                   pack_out=self.pack, dtype=self.dtype, name="cv2")(y, training)
        if self.shortcut and x.shape[-1] == self.c2 * self.pack:
            return x + y
        return y


class _Kernel(nn.Module):
    """Declares a conv kernel param (same path/init as nn.Conv's 'kernel')."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_uniform(), self.shape, jnp.float32)


class _BN(nn.Module):
    """Declares BatchNorm variables (same paths as nn.BatchNorm), returns them."""

    c: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c,), jnp.float32)
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.c,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((self.c,), jnp.float32))
        return scale, bias, mean.value, var.value


class PackedBN(nn.Module):
    """BatchNorm over a width-packed (B, H, W/P, P*C) activation.

    Exact flax nn.BatchNorm semantics (f32 fast-variance stats, f32
    normalization, cast to `dtype` at the end, same momentum/eps and the
    same variable paths: params scale/bias + batch_stats mean/var), but the
    per-channel statistics reduce over the P lane groups too — every spatial
    position contributes exactly once, so the stats equal the unpacked ones.
    This is what lets the TRAINING graph run the low-channel stages width-
    packed (dense 128-lane tiles) without changing BN numerics or the
    checkpoint layout.
    """

    c: int
    P: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y, training: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((self.c,), jnp.float32))
        stat_dt = jnp.promote_types(y.dtype, jnp.float32)  # f32 floor, like flax
        if training:
            # lane-space statistics: reduce (B, H, W/P) on the PACKED layout
            # straight to a (P*C,) lane vector (dense 128-lane tiled reads),
            # then fold the P groups on the tiny (P, C) matrix. The previous
            # 5-D reshape form forced XLA into {.,4,3,2,0}-layout
            # intermediates whose fwd+bwd round-trip copies showed up as
            # ~3 ms/step of layout copies at v10n b32 (xplane).
            yl = y.astype(stat_dt)
            n = y.shape[0] * y.shape[1] * y.shape[2] * self.P
            s1 = jnp.sum(yl, axis=(0, 1, 2)).reshape(self.P, self.c)
            s2 = jnp.sum(yl * yl, axis=(0, 1, 2)).reshape(self.P, self.c)
            mean = jnp.sum(s1, axis=0) / n
            var = jnp.maximum(jnp.sum(s2, axis=0) / n - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = BN_MOMENTUM * ra_mean.value + (1.0 - BN_MOMENTUM) * mean.astype(jnp.float32)
                ra_var.value = BN_MOMENTUM * ra_var.value + (1.0 - BN_MOMENTUM) * var.astype(jnp.float32)
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = jax.lax.rsqrt(var.astype(stat_dt) + BN_EPS) * scale
        out = (y.astype(stat_dt) - jnp.tile(mean.astype(stat_dt), self.P)) * jnp.tile(mul, self.P) \
            + jnp.tile(bias.astype(stat_dt), self.P)
        return out.astype(self.dtype)


class _FusedConvBN(nn.Module):
    """ConvBN's variable tree without executing it; returns BN-folded (W, b).

    Lets deploy-mode blocks do kernel algebra (zero-padding, column sums)
    while staying checkpoint-compatible with the training-mode modules.
    Works with both raw and fuse_conv_bn-transformed variables (the fold is
    the identity on already-fused ones).
    """

    c1: int
    c2: int
    k: int = 1
    g: int = 1

    @nn.compact
    def __call__(self):
        w = _Kernel((self.k, self.k, self.c1 // self.g, self.c2), name="conv")()
        scale, bias, mean, var = _BN(self.c2, name="bn")()
        f = scale * jax.lax.rsqrt(var + BN_EPS)
        return w * f, bias - mean * f


class _BottleneckParams(nn.Module):
    """Bottleneck's variable tree (cv1, cv2) as fused (W, b) pairs."""

    c: int

    @nn.compact
    def __call__(self):
        p1 = _FusedConvBN(self.c, self.c, 3, name="cv1")()
        p2 = _FusedConvBN(self.c, self.c, 3, name="cv2")()
        return p1, p2


class C2f(nn.Module):
    """CSP bottleneck, 2-conv 'faster' variant (reference block.py:214).

    deploy=True switches to an inference-only rewrite that eliminates the
    channel slice/concat (measured 2-3x faster on TPU at large spatial dims,
    where XLA pays layout copies for lane-axis splits). The rewrite is exact
    kernel algebra over the same variable tree:
      cv2(concat[a, b, m_1..m_n]) = conv(y, [Wa ; Wb + sum_k Wm_k])
                                    + sum_j conv(g_j, sum_{k>=j} Wm_k)
    with m_k = b + sum_{j<=k} g_j (shortcut) and each bottleneck's first conv
    fed from y via an input-channel-zero-padded kernel.
    """

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    deploy: bool = False
    pack: int = 1  # deploy-path width-pack factor (128 // c2)
    pack_in: int = 1  # input pack factor (1 = unpacked input; cv1 packs)
    s2d_in: bool = False  # deploy: input is the PRE-space_to_depth map (fold)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False, up_pair=None):
        c = int(self.c2 * self.e)
        if self.deploy and not training and self.g == 1 and up_pair is None:
            return self._deploy_call(x, c)
        if self.pack > 1 and not (not training and DEPLOY_MATH.get()):
            # training-path width packing: plain C2f structure with every
            # ConvBN packed at a uniform factor P. The channel split/concat
            # become minor-dim lane reshapes ((..., P*C) <-> (..., P, C)),
            # which XLA lowers without relayout copies on the packed tiles.
            P = self.pack
            y = ConvBN(2 * c, 1, 1, act="mish", pack_in=self.pack_in, pack_out=P,
                       s2d_in=self.s2d_in, dtype=self.dtype, name="cv1")(x, training)
            B, H, Wp = y.shape[:3]
            yr = y.reshape(B, H, Wp, P, 2 * c)
            ys = [yr[..., :c].reshape(B, H, Wp, P * c), yr[..., c:].reshape(B, H, Wp, P * c)]
            for i in range(self.n):
                ys.append(
                    Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, pack=P,
                               dtype=self.dtype, name=f"m_{i}")(ys[-1], training)
                )
            cat = jnp.concatenate([t.reshape(B, H, Wp, P, c) for t in ys], axis=-1)
            cat = cat.reshape(B, H, Wp, P * (2 + self.n) * c)
            return ConvBN(self.c2, 1, act="mish", pack_in=P, pack_out=P,
                          dtype=self.dtype, name="cv2")(cat, training)
        if up_pair is not None and not training and DEPLOY_MATH.get() and self.pack == 1:
            # upsample-commute (serving graphs): this C2f's input is
            # concat([up2(x_small), skip]) and cv1 is 1x1, so the x_small
            # part of cv1 commutes through the NEAREST upsample:
            #   cv1(concat([up(xs), sk])) == up(conv(xs, Wa)) + conv(sk, Wb) + b
            # (input-row split of the kernel). The conv over the upsampled
            # map runs at 1/4 the spatial cost and the 2x-repeat broadcast
            # writes out-channels instead of in-channels (~0.6 ms/step
            # across v10m's two neck junctions, xplane-profiled).
            x_small, skip = up_pair
            cs = x_small.shape[-1]
            c1 = cs + skip.shape[-1]
            w, b = _FusedConvBN(c1, 2 * c, 1, name="cv1")()
            w = w.astype(self.dtype)
            conv1 = lambda t, wk: q8_conv(t, wk, (1, 1), [(0, 0), (0, 0)])
            a = conv1(x_small, w[:, :, :cs])
            a = jnp.repeat(jnp.repeat(a, 2, axis=1), 2, axis=2)
            y = mish(a + conv1(skip, w[:, :, cs:]) + b.astype(self.dtype))
        else:
            y = ConvBN(2 * c, 1, 1, act="mish", s2d_in=self.s2d_in, dtype=self.dtype, name="cv1")(x, training)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(
                    c, self.shortcut, self.g, k=(3, 3), e=1.0,
                    dtype=self.dtype, name=f"m_{i}",
                )(ys[-1], training)
            )
        if not training and DEPLOY_MATH.get():
            # s8-domain concat: the wide (2+n)*c tail tensor is the dominant
            # requantize cost on the >128-ch scales that serve through this
            # naive path (the kernel-algebra rewrite is gated to C<=128)
            w, b = _FusedConvBN((2 + self.n) * c, self.c2, 1, name="cv2")()
            out = q8_concat_conv([t.astype(self.dtype) for t in ys], w.astype(self.dtype))
            return apply_act(out + b.astype(self.dtype), "mish")
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), training
        )

    def _deploy_call(self, x, c):
        dt = self.dtype
        layout = ("NHWC", "HWIO", "NHWC")
        c1 = x.shape[-1]
        if self.s2d_in:
            c1 = c1 * 4  # cv1 is declared against the s2d output (4C rows)
        if self.pack > 1:
            return self._deploy_call_packed(x, c, c1 // self.pack_in)
        w_cv1, b_cv1 = _FusedConvBN(c1, 2 * c, 1, name="cv1")()
        w_cv2, b_cv2 = _FusedConvBN((2 + self.n) * c, self.c2, 1, name="cv2")()
        bots = [_BottleneckParams(c, name=f"m_{i}")() for i in range(self.n)]

        def conv(t, w, p=0):
            # q8_conv keeps the kernel-algebra (pad/sum/concat of folded
            # kernels) behind an optimization_barrier so it is not recomputed
            # per conv tile; under an active int8 QuantCtx the conv runs on
            # the int8 MXU path with this site's calibrated input scale
            return q8_conv(t, w.astype(dt), (1, 1), [(p, p), (p, p)])

        def pad_front(w):  # consume full y (2c ch), select the b half
            return jnp.concatenate([jnp.zeros_like(w[:, :, :c]), w], axis=2)

        if self.s2d_in:
            # folded space_to_depth: cv1's 1x1 kernel becomes a 2x2 stride-2
            # conv on the pre-s2d map (s2d_fold_kernel) — the s2d layout op
            # never materializes
            y = q8_conv(x, s2d_fold_kernel(w_cv1).astype(dt), (2, 2), [(0, 0), (0, 0)])
            y = mish(y + b_cv1.astype(dt))
        else:
            y = mish(conv(x, w_cv1) + b_cv1.astype(dt))
        gs = []
        for k in range(self.n):
            (w1, b1), (w2, b2) = bots[k]
            t = conv(y, pad_front(w1), p=1)
            if self.shortcut:
                for j in range(k):
                    t = t + conv(gs[j], w1, p=1)
            elif k > 0:
                t = conv(gs[k - 1], w1, p=1)
            h = mish(t + b1.astype(dt))
            gs.append(mish(conv(h, w2, p=1) + b2.astype(dt)))

        w_a = w_cv2[:, :, :c, :]
        w_b = w_cv2[:, :, c:2 * c, :]
        w_m = [w_cv2[:, :, (2 + k) * c:(3 + k) * c, :] for k in range(self.n)]
        if self.shortcut:
            w_y = jnp.concatenate([w_a, w_b + sum(w_m)], axis=2)
            out = conv(y, w_y)
            for j in range(self.n):
                out = out + conv(gs[j], sum(w_m[j:]))
        else:
            w_y = jnp.concatenate([w_a, w_b], axis=2)
            out = conv(y, w_y)
            for k in range(self.n):
                out = out + conv(gs[k], w_m[k])
        return mish(out + b_cv2.astype(dt))

    def _deploy_call_packed(self, x, c, c1):
        """Width-packed 'packed-plain' rewrite: the plain C2f dataflow with
        every conv in packed form and zero slice/concat relayouts.

        The O(n^2) kernel-sum rewrite above pays pad_front (doubled first-conv
        input channels) plus n(n-1)/2 extra convs — xplane-profiled at ~3x
        the block's logical FLOPs on v10m's C2f96. Here instead:
          * cv1 splits into a/b convs by slicing its OUT channels at trace
            time (kernel slice == activation slice, but free);
          * the bottleneck chain materializes m_k directly (packed residual
            adds are elementwise — no decomposition needed);
          * cv2 consumes the naive channel-concat of packed pieces through a
            BLOCK-PERMUTED packed kernel: concat order is piece-major
            ([piece][subpixel][c]) while a packed kernel expects
            subpixel-major, so the scatter maps input block (q*P + j) to
            w_cv2's piece-q rows for output block j.
        Logical FLOP overhead is exactly the pack factor (the usual packed
        zero-block cost) — no structural extra terms.
        """
        dt = self.dtype
        P = self.pack
        w_cv1, b_cv1 = _FusedConvBN(c1, 2 * c, 1, name="cv1")()
        w_cv2, b_cv2 = _FusedConvBN((2 + self.n) * c, self.c2, 1, name="cv2")()
        bots = [_BottleneckParams(c, name=f"m_{i}")() for i in range(self.n)]

        if self.s2d_in:
            # folded space_to_depth (see _deploy_call): 2x2 stride-2 packed
            # cv1 on the pre-s2d packed map; requires (2*P) % pack_in == 0
            y1 = packed_conv_grouped_out(
                x, s2d_fold_kernel(w_cv1).astype(dt), 2, self.pack_in, P, (c, c),
                b=b_cv1.astype(dt), act="mish", pl=0, ph=(0, 0),
            )
        else:
            y1 = packed_conv_grouped_out(
                x, w_cv1.astype(dt), 1, self.pack_in, P, (c, c),
                b=b_cv1.astype(dt), act="mish",
            )
        a = y1[..., : P * c]
        m = y1[..., P * c:]
        ys = [a, m]
        for k in range(self.n):
            (w1, b1), (w2, b2) = bots[k]
            t = packed_conv(m, w1.astype(dt), 1, P, P, b=b1.astype(dt), act="mish")
            t = packed_conv(t, w2.astype(dt), 1, P, P, b=b2.astype(dt), act="mish")
            m = m + t if self.shortcut else t
            ys.append(m)

        n_pieces = 2 + self.n
        Wp = jnp.zeros((1, 1, n_pieces * P * c, P * self.c2), w_cv2.dtype)
        for q in range(n_pieces):
            for j in range(P):
                Wp = Wp.at[
                    0, 0, (q * P + j) * c:(q * P + j + 1) * c,
                    j * self.c2:(j + 1) * self.c2,
                ].set(w_cv2[0, 0, q * c:(q + 1) * c, :])
        # q8_concat_conv barriers the scattered kernel and, under an active
        # int8 QuantCtx, concats the packed pieces in the s8 domain
        out = q8_concat_conv(ys, Wp.astype(dt))
        return mish(out + jnp.tile(b_cv2.astype(dt), P))


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (reference block.py:156). Three chained
    stride-1 maxpools; each is a cheap VPU reduce_window on TPU."""

    c2: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        if not training and DEPLOY_MATH.get():
            # pool-commute tail: quantize commutes with max-pool exactly, so
            # under int8 the pools and the 4c_ concat stay in the s8 domain
            # (one quantize of cv1's output covers all four branches)
            w, b = _FusedConvBN(4 * c_, self.c2, 1, name="cv2")()
            y = q8_pool_concat_conv(x, w.astype(self.dtype), self.k)
            return apply_act(y + b.astype(self.dtype), "mish")
        p = self.k // 2
        pool = lambda t: nn.max_pool(t, (self.k, self.k), strides=(1, 1), padding=[(p, p), (p, p)])
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), training
        )


class SCDown(nn.Module):
    """Spatial-channel decoupled downsample (reference block.py:818)."""

    c2: int
    k: int = 3
    s: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        return ConvBN(self.c2, self.k, self.s, g=self.c2, act=False, dtype=self.dtype, name="cv2")(x, training)


class RepVGGDW(nn.Module):
    """Train-time dual-branch depthwise conv (7x7 + 3x3), fused at deploy
    (reference block.py:700). Fusion = pad 3x3 kernel to 7x7 and add (fuse.py)."""

    ed: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        a = ConvBN(self.ed, 7, 1, p=3, g=self.ed, act=False, dtype=self.dtype, name="conv")(x, training)
        b = ConvBN(self.ed, 3, 1, p=1, g=self.ed, act=False, dtype=self.dtype, name="conv1")(x, training)
        return nn.silu(a + b)


class CIB(nn.Module):
    """Compact inverted block (reference block.py:735)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = ConvBN(c1, 3, g=c1, act="mish", dtype=self.dtype, name="cv1_0")(x, training)
        y = ConvBN(2 * c_, 1, act="mish", dtype=self.dtype, name="cv1_1")(y, training)
        if self.lk:
            y = RepVGGDW(2 * c_, dtype=self.dtype, name="cv1_2")(y, training)
        else:
            y = ConvBN(2 * c_, 3, g=2 * c_, act="mish", dtype=self.dtype, name="cv1_2")(y, training)
        y = ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv1_3")(y, training)
        y = ConvBN(self.c2, 3, g=self.c2, act="mish", dtype=self.dtype, name="cv1_4")(y, training)
        if self.shortcut and c1 == self.c2:
            return x + y
        return y


class C2fCIB(nn.Module):
    """C2f with CIB bottlenecks (reference block.py:758)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                CIB(c, self.shortcut, e=1.0, lk=self.lk, dtype=self.dtype, name=f"m_{i}")(ys[-1], training)
            )
        if not training and DEPLOY_MATH.get():
            # s8-domain concat tail (see C2f): C2fCIB carries the widest
            # concats on the b/l/x scales (up to (2+n)*c at P4/P5)
            w, b = _FusedConvBN((2 + self.n) * c, self.c2, 1, name="cv2")()
            out = q8_concat_conv([t.astype(self.dtype) for t in ys], w.astype(self.dtype))
            return apply_act(out + b.astype(self.dtype), "mish")
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), training)


class Attention(nn.Module):
    """Single-layer spatial self-attention on a feature map (reference block.py:769).

    Runs on <=400 tokens (stride-32 map); QK^T and AV are MXU matmuls.
    """

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        B, H, W, C = x.shape
        N = H * W
        nh = self.num_heads
        hd = C // nh
        kd = int(hd * self.attn_ratio)
        scale = kd**-0.5
        h_total = C + kd * nh * 2

        qkv = ConvBN(h_total, 1, act=False, dtype=self.dtype, name="qkv")(x, training)
        qkv = qkv.reshape(B, N, nh, kd * 2 + hd)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)  # (B,N,nh,kd),(B,N,nh,kd),(B,N,nh,hd)

        attn = jnp.einsum("bind,bjnd->bnij", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnij,bjnd->bind", attn, v)  # (B,N,nh,hd)
        out = out.reshape(B, H, W, C)
        pe = ConvBN(C, 3, 1, g=C, act=False, dtype=self.dtype, name="pe")(v.reshape(B, H, W, C), training)
        return ConvBN(C, 1, act=False, dtype=self.dtype, name="proj")(out + pe, training)


class PSA(nn.Module):
    """Partial self-attention block (reference block.py:797)."""

    c2: int
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = int(x.shape[-1] * self.e)
        y = ConvBN(2 * c, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        a, b = y[..., :c], y[..., c:]
        b = b + Attention(c, num_heads=max(c // 64, 1), attn_ratio=0.5, dtype=self.dtype, name="attn")(
            b, training
        )
        f = ConvBN(c * 2, 1, act="mish", dtype=self.dtype, name="ffn_0")(b, training)
        f = ConvBN(c, 1, act=False, dtype=self.dtype, name="ffn_1")(f, training)
        b = b + f
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], axis=-1), training)


class Upsample(nn.Module):
    """2x nearest upsample (torch nn.Upsample(None, 2, 'nearest'))."""

    scale: int = 2

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = jnp.repeat(x, self.scale, axis=1)
        return jnp.repeat(x, self.scale, axis=2)


class Concat(nn.Module):
    """Channel concat of routed inputs (NHWC: last axis)."""

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], training: bool = False):
        return jnp.concatenate(list(xs), axis=-1)


class SpaceToDepth(nn.Module):
    """2x2 space-to-depth, channel order matching the reference's strided-slice
    concat (block.py:4063-4070): [(h0,w0), (h1,w0), (h0,w1), (h1,w1)]."""

    @nn.compact
    def __call__(self, x, training: bool = False):
        return jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
            axis=-1,
        )


class SPDConv(nn.Module):
    """space_to_depth + Conv+BN+SiLU (reference block.py:5777)."""

    c2: int
    k: int = 1
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = SpaceToDepth(name="spd")(x)
        pad = autopad(self.k)
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            kernel_init=kaiming_uniform(),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not training, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="bn"
        )(x)
        return nn.silu(x)


class SPCA(nn.Module):
    """Spatial-Pyramid Context Attention (reference block.py:5725): three
    parallel dilated depthwise 3x3 convs (d=1,2,3) -> 1x1 merge, gated by an
    SE-style global channel attention, residual add.

    The three depthwise branches share one input; XLA fuses them into a single
    VPU pass per branch. Raw nn.Conv (with bias on pointwise) mirrors the
    reference, which uses plain nn.Conv2d here (no BN).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = x.shape[-1]
        feats = []
        for i, d in enumerate((1, 2, 3)):
            feats.append(
                nn.Conv(
                    c,
                    (3, 3),
                    padding=[(d, d), (d, d)],
                    kernel_dilation=(d, d),
                    feature_group_count=c,
                    use_bias=False,
                    kernel_init=kaiming_uniform(),
                    dtype=self.dtype,
                    name=f"dilated_convs_{i}",
                )(x)
            )
        spatial = nn.Conv(
            c, (1, 1), use_bias=True, kernel_init=kaiming_uniform(), dtype=self.dtype, name="pointwise"
        )(jnp.concatenate(feats, axis=-1))

        g = jnp.mean(x, axis=(1, 2), keepdims=True)  # global avg pool
        g = nn.Conv(c // 4, (1, 1), use_bias=False, kernel_init=kaiming_uniform(), dtype=self.dtype, name="attention_0")(g)
        g = nn.relu(g)
        g = nn.Conv(c, (1, 1), use_bias=False, kernel_init=kaiming_uniform(), dtype=self.dtype, name="attention_2")(g)
        attn = nn.sigmoid(g)
        return spatial * attn + x


class SPCABottleneck(nn.Module):
    """cv1 1x1 -> SPCA -> cv3 1x1 (+residual) (reference block.py:5757)."""

    c2: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = self.c2 // 2
        y = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        y = SPCA(dtype=self.dtype, name="cv2")(y, training)
        y = ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv3")(y, training)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class C2fSPCA(nn.Module):
    """C2f with SPCA bottlenecks (reference block.py:5752)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(SPCABottleneck(c, self.shortcut, dtype=self.dtype, name=f"m_{i}")(ys[-1], training))
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), training)


def channel_shuffle2(x: jnp.ndarray) -> jnp.ndarray:
    """2-group channel shuffle: out[..., j] = in[..., 2j] for the first half,
    in[..., 2j+1] for the second (equivalent to the reference LPC's
    reshape/permute dance, block.py:5817-5826)."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W, C // 2, 2).transpose(0, 1, 2, 4, 3).reshape(B, H, W, C)


class LPC(nn.Module):
    """Light Perception Convolution (the fork's core contribution,
    reference block.py:5801): half-channel conv -> 5x5 depthwise -> concat ->
    SPCA -> 2-group channel shuffle."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = self.c2 // 2
        x1 = ConvBN(c_, self.k, self.s, g=self.g, act="mish", dtype=self.dtype, name="cv1")(x, training)
        x2 = ConvBN(c_, 5, 1, g=c_, act="mish", dtype=self.dtype, name="cv2")(x1, training)
        y = jnp.concatenate([x1, x2], axis=-1)
        y = SPCA(dtype=self.dtype, name="spca")(y, training)
        return channel_shuffle2(y)


class ChannelAttention(nn.Module):
    """CBAM channel attention, conv.py variant (the one the reference's module
    registry actually resolves for YAML `CBAM` layers): global avg-pool ->
    single 1x1 conv (bias) -> sigmoid gate."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(c, (1, 1), use_bias=True, kernel_init=kaiming_uniform(), dtype=self.dtype, name="fc")(g)
        return x * nn.sigmoid(g)


class SpatialAttention(nn.Module):
    """CBAM spatial attention (reference conv.py SpatialAttention)."""

    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        p = 3 if self.kernel_size == 7 else 1
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], axis=-1)
        y = nn.Conv(
            1,
            (self.kernel_size, self.kernel_size),
            padding=[(p, p), (p, p)],
            use_bias=False,
            kernel_init=kaiming_uniform(),
            dtype=self.dtype,
            name="cv1",
        )(y)
        return x * nn.sigmoid(y)


class RepConv(nn.Module):
    """Train-time multi-branch conv (reference conv.py:175-260): 3x3 + 1x1
    (+ identity BN when shapes allow), SiLU; deploys to one conv by kernel
    padding+summation (a fuse.py-style transform, roadmap like RepVGGDW)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = "silu"
    use_identity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.k == 3
        y1 = ConvBN(self.c2, 3, self.s, p=1, g=self.g, act=False, dtype=self.dtype, name="conv1")(x, training)
        y2 = ConvBN(self.c2, 1, self.s, p=0, g=self.g, act=False, dtype=self.dtype, name="conv2")(x, training)
        y = y1 + y2
        if self.use_identity and x.shape[-1] == self.c2 and self.s == 1:
            ident = nn.BatchNorm(
                use_running_average=not training, momentum=BN_MOMENTUM, epsilon=BN_EPS,
                dtype=self.dtype, name="bn",
            )(x)
            y = y + ident
        return apply_act(y, self.act)


class CBAM(nn.Module):
    """Convolutional Block Attention Module (reference conv.py CBAM — the
    variant wired into parse_model; YAML arg is the spatial kernel size)."""

    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = ChannelAttention(dtype=self.dtype, name="channel_attention")(x, training)
        return SpatialAttention(self.kernel_size, dtype=self.dtype, name="spatial_attention")(x, training)


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference block.py:240)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, k=(1, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(a, training)
        b = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv2")(x, training)
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], axis=-1), training)


class Focus(nn.Module):
    """Focus wh into channels then conv (reference conv.py Focus)."""

    c2: int
    k: int = 1
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
            axis=-1,
        )
        return ConvBN(self.c2, self.k, self.s, dtype=self.dtype, name="conv")(y, training)


class GhostConv(nn.Module):
    """Ghost convolution (reference conv.py GhostConv)."""

    c2: int
    k: int = 1
    s: int = 1
    act: Any = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = self.c2 // 2
        y = ConvBN(c_, self.k, self.s, act=self.act, dtype=self.dtype, name="cv1")(x, training)
        y2 = ConvBN(c_, 5, 1, g=c_, act=self.act, dtype=self.dtype, name="cv2")(y, training)
        return jnp.concatenate([y, y2], axis=-1)


class Proto(nn.Module):
    """YOLOv8 mask prototype head (reference block.py:64)."""

    c_: int = 256
    c2: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = ConvBN(self.c_, 3, act="mish", dtype=self.dtype, name="cv1")(x, training)
        x = nn.ConvTranspose(
            self.c_, (2, 2), strides=(2, 2), use_bias=True, transpose_kernel=True,
            kernel_init=kaiming_uniform(), dtype=self.dtype, name="upsample"
        )(x)
        x = ConvBN(self.c_, 3, act="mish", dtype=self.dtype, name="cv2")(x, training)
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv3")(x, training)


# --------------------------------------------------------------------- v9 set
class RepBottleneck(nn.Module):
    """Rep bottleneck (reference block.py:559-573): RepConv 3x3 -> Conv 3x3.
    cv1 is conv.py's RepConv (SiLU); cv2 resolves block.py's Mish Conv."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        # reference RepConv defaults to bn=False: no identity-BN branch
        y = RepConv(c_, self.k[0], 1, use_identity=False, dtype=self.dtype, name="cv1")(x, training)
        y = ConvBN(self.c2, self.k[1], 1, g=self.g, act="mish", dtype=self.dtype, name="cv2")(y, training)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class RepCSP(nn.Module):
    """Rep CSP bottleneck with 3 convolutions (reference block.py:575-590)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        for i in range(self.n):
            a = RepBottleneck(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m_{i}")(a, training)
        b = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv2")(x, training)
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), training
        )


class RepNCSPELAN4(nn.Module):
    """CSP-ELAN (reference block.py:592-614): split + two RepCSP->Conv stages."""

    c2: int
    c3: int
    c4: int
    n: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.c3 // 2
        y = ConvBN(self.c3, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        ys = [y[..., :c], y[..., c:]]
        a = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv2_0")(ys[-1], training)
        a = ConvBN(self.c4, 3, 1, act="mish", dtype=self.dtype, name="cv2_1")(a, training)
        ys.append(a)
        b = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv3_0")(ys[-1], training)
        b = ConvBN(self.c4, 3, 1, act="mish", dtype=self.dtype, name="cv3_1")(b, training)
        ys.append(b)
        return ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv4")(
            jnp.concatenate(ys, axis=-1), training
        )


class ADown(nn.Module):
    """v9 downsample (reference block.py:617-635): avg-pool + split, strided
    conv on one half, max-pool + 1x1 on the other."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.c2 // 2
        # torch avg_pool2d(x, 2, 1, 0): kernel 2, stride 1, no pad -> H-1
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        x1 = ConvBN(c, 3, 2, p=1, act="mish", dtype=self.dtype, name="cv1")(x1, training)
        x2 = nn.max_pool(x2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x2 = ConvBN(c, 1, 1, p=0, act="mish", dtype=self.dtype, name="cv2")(x2, training)
        return jnp.concatenate([x1, x2], axis=-1)


class SPPELAN(nn.Module):
    """SPP-ELAN (reference block.py:637-655)."""

    c2: int
    c3: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = [ConvBN(self.c3, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)]
        p = self.k // 2
        for _ in range(3):
            y.append(nn.max_pool(y[-1], (self.k, self.k), strides=(1, 1), padding=[(p, p), (p, p)]))
        return ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv5")(
            jnp.concatenate(y, axis=-1), training
        )


class Silence(nn.Module):
    """Identity (reference block.py:658-666)."""

    @nn.compact
    def __call__(self, x, training: bool = False):
        return x


class CBLinear(nn.Module):
    """1x1 conv (with bias, no BN/act) split into a tuple of feature maps
    (reference block.py:669-681)."""

    c2s: Tuple[int, ...]
    k: int = 1
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        pad = autopad(self.k)
        y = nn.Conv(
            sum(self.c2s), (self.k, self.k), strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)], use_bias=True,
            kernel_init=kaiming_uniform(), dtype=self.dtype, name="conv",
        )(x)
        outs, o = [], 0
        for c in self.c2s:
            outs.append(y[..., o:o + c])
            o += c
        return tuple(outs)


class CBFuse(nn.Module):
    """Selective nearest-upsample + sum fusion (reference block.py:684-698).
    Input: list whose first entries are CBLinear tuples, last is a tensor."""

    idx: Tuple[int, ...]

    @nn.compact
    def __call__(self, xs, training: bool = False):
        target = xs[-1].shape[1:3]
        total = xs[-1]
        for i, x in enumerate(xs[:-1]):
            t = x[self.idx[i]]
            total = total + jax.image.resize(
                t, (t.shape[0], target[0], target[1], t.shape[3]), method="nearest"
            )
        return total


# ------------------------------------------------------------- YOLO-World set
class MaxSigmoidAttnBlock(nn.Module):
    """Max-sigmoid text-guided attention (reference block.py:404-437)."""

    c2: int
    nh: int = 1
    ec: int = 128
    gc: int = 512
    scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, guide, training: bool = False):
        B, H, W, c1 = x.shape
        hc = self.c2 // self.nh
        embed = (
            ConvBN(self.ec, 1, act=False, dtype=self.dtype, name="ec")(x, training)
            if c1 != self.ec
            else x
        )
        g = nn.Dense(self.ec, kernel_init=kaiming_uniform(), dtype=self.dtype, name="gl")(guide)
        g = g.reshape(B, -1, self.nh, hc)  # (B, M, nh, hc)
        e = embed.reshape(B, H, W, self.nh, hc)
        aw = jnp.einsum("bhwmc,bnmc->bhwmn", e, g)  # (B, H, W, nh, M)
        aw = jnp.max(aw, axis=-1) / (hc**0.5)
        bias = self.param("bias", nn.initializers.zeros, (self.nh,))
        aw = jax.nn.sigmoid(aw + bias)
        if self.scale:
            aw = aw * self.param("scale", nn.initializers.ones, (1, 1, 1, self.nh))
        y = ConvBN(self.c2, 3, 1, act=False, dtype=self.dtype, name="proj_conv")(x, training)
        y = y.reshape(B, H, W, self.nh, hc) * aw[..., None]
        return y.reshape(B, H, W, self.c2)


class C2fAttn(nn.Module):
    """C2f with a text-guided attention branch (reference block.py:439-465)."""

    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, guide, training: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(
                    ys[-1], training
                )
            )
        ys.append(
            MaxSigmoidAttnBlock(c, nh=self.nh, ec=self.ec, gc=self.gc, dtype=self.dtype, name="attn")(
                ys[-1], guide, training
            )
        )
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), training
        )


class ImagePoolingAttn(nn.Module):
    """Image-aware text-embedding enhancement (reference block.py:468-511):
    adaptive k x k max-pool each level, cross-attend text -> pooled patches."""

    ec: int = 256
    ch: Tuple[int, ...] = ()
    ct: int = 512
    nh: int = 8
    k: int = 3
    scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, text, training: bool = False):
        B = xs[0].shape[0]
        hc = self.ec // self.nh
        pooled = []
        for i, x in enumerate(xs):
            x = nn.Conv(
                self.ec, (1, 1), use_bias=True, kernel_init=kaiming_uniform(),
                dtype=self.dtype, name=f"projections_{i}",
            )(x)
            # torch AdaptiveMaxPool2d((k, k)) windows: [floor(j*H/k), ceil((j+1)*H/k))
            H, W = x.shape[1], x.shape[2]
            rows = []
            for r in range(self.k):
                cols = []
                r0, r1 = (r * H) // self.k, -(-((r + 1) * H) // self.k)
                for cdx in range(self.k):
                    c0, c1 = (cdx * W) // self.k, -(-((cdx + 1) * W) // self.k)
                    cols.append(jnp.max(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
                rows.append(jnp.stack(cols, axis=1))
            pooled.append(jnp.stack(rows, axis=1).reshape(B, self.k * self.k, self.ec))
        p = jnp.concatenate(pooled, axis=1)  # (B, nf*k^2, ec)

        q = nn.LayerNorm(dtype=self.dtype, name="query_ln")(text)
        q = nn.Dense(self.ec, kernel_init=kaiming_uniform(), dtype=self.dtype, name="query_fc")(q)
        kk = nn.LayerNorm(dtype=self.dtype, name="key_ln")(p)
        kk = nn.Dense(self.ec, kernel_init=kaiming_uniform(), dtype=self.dtype, name="key_fc")(kk)
        v = nn.LayerNorm(dtype=self.dtype, name="value_ln")(p)
        v = nn.Dense(self.ec, kernel_init=kaiming_uniform(), dtype=self.dtype, name="value_fc")(v)
        M = text.shape[1]
        q = q.reshape(B, M, self.nh, hc)
        kk = kk.reshape(B, -1, self.nh, hc)
        v = v.reshape(B, -1, self.nh, hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", q, kk) / (hc**0.5)
        aw = jax.nn.softmax(aw, axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, v).reshape(B, M, self.ec)
        out = nn.Dense(self.ct, kernel_init=kaiming_uniform(), dtype=self.dtype, name="proj")(out)
        s = self.param("scale", nn.initializers.zeros, (1,)) if self.scale else 1.0
        return out * s + text


class ContrastiveHead(nn.Module):
    """Region-text similarity logits (reference block.py:514-531)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w, training: bool = False):
        # x (B, H, W, C), w (B, M, C) -> (B, H, W, M)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        bias = self.param("bias", nn.initializers.zeros, ())
        logit_scale = self.param(
            "logit_scale", lambda k, s: jnp.full(s, math.log(1 / 0.07)), ()
        )
        return jnp.einsum("bhwc,bmc->bhwm", x, w) * jnp.exp(logit_scale) + bias


class BNContrastiveHead(nn.Module):
    """BatchNorm variant of ContrastiveHead (reference block.py:534-556)."""

    embed_dims: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w, training: bool = False):
        x = nn.BatchNorm(
            use_running_average=not training, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="norm",
        )(x)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        bias = self.param("bias", nn.initializers.zeros, ())
        logit_scale = self.param("logit_scale", lambda k, s: jnp.full(s, -1.0), ())
        return jnp.einsum("bhwc,bmc->bhwm", x, w) * jnp.exp(logit_scale) + bias


# ---------------------------------------------------------------------------
# Width-packed serving layout (deploy path)
#
# TPU tiles put the channel dim on the 128-wide lane axis, so the stem's
# C=16/32/64 activations waste 8x/4x/2x of every HBM access. The deploy
# graph therefore packs P = 128/C horizontally-adjacent pixels into one
# 128-channel "packed pixel": activations become (B, H, W/P, P*C) — dense
# lanes — and every conv is rewritten as an exactly-equivalent conv over the
# packed layout with a block-scattered kernel. Profiled on v10n b32: the
# sub-128-channel region costs ~8 ms of the 17 ms step unpacked.
# ---------------------------------------------------------------------------


def pack_width(x, P: int):
    """(B, H, W, C) -> (B, H, W/P, P*C). Row-major contiguous: free reshape."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // P, P * c)


def unpack_width(x, P: int):
    """(B, H, W/P, P*C) -> (B, H, W, C)."""
    b, h, wp, pc = x.shape
    return x.reshape(b, h, wp * P, pc // P)


def repack_width(x, P_from: int, P_to: int):
    """Change pack factor: (B, H, W/Pf, Pf*C) -> (B, H, W/Pt, Pt*C).

    The flattened element order of a width-packed buffer is P-invariant
    (w-major, channel-minor for every P), so this is a FREE reshape — no data
    movement, any Pf -> Pt.
    """
    if P_from == P_to:
        return x
    b, h, wp, pc = x.shape
    c = pc // P_from
    return x.reshape(b, h, wp * P_from // P_to, P_to * c)


def s2d_fold_kernel(w):
    """Fold a 2x2 space_to_depth into the kernel of the conv that consumes it.

    space_to_depth (SpaceToDepth, reference block.py:4063) is a pure layout
    op: z[i, j, blk*C + c] = x[2i + bh, 2j + bw, c] with blk = bh + 2*bw
    (the strided-slice concat order). A conv over z with kernel
    w (kh, kw, 4C, cout), stride sigma, torch-'same' padding p = kh//2 is
    therefore EXACTLY a conv over the pre-s2d map x with
      kernel  W2 (2kh, 2kw, C, cout),  W2[2dh+bh, 2dw+bw, c, o] = w[dh, dw, blk*C+c, o]
      stride  2*sigma
      padding (2p, 2k-2-2p) per spatial dim.
    On the deploy serving path this compiles the s2d away entirely (the
    unpack -> strided-slice concat -> repack traffic it would otherwise cost)
    and keeps the width-pack chain unbroken across stage boundaries.
    """
    kh, kw, c4, cout = w.shape
    C = c4 // 4
    rows = []
    for q in range(2 * kh):
        dh, bh = q // 2, q % 2
        cols = []
        for r in range(2 * kw):
            dw, bw = r // 2, r % 2
            blk = bh + 2 * bw
            cols.append(w[dh, dw, blk * C:(blk + 1) * C])
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def pack_conv_kernel(w, P_in: int, P_out: int, s: int, pl: Optional[int] = None):
    """Rewrite an HWIO kernel for width-packed operands.

    Returns (Wp, sp, (padL, padR)) such that
      conv(x_packed, Wp, stride=(s, sp), pad_w=(padL, padR))
        == pack(conv(unpack(x_packed), w, stride=(s, s), pad_w=(pl, ...)), P_out)
    Requires s * P_out % P_in == 0 (all v10n prefix cases). The scatter runs
    at trace time over <=3*P_out small kernel blocks.

    pl is the full-res LEFT padding of the logical conv; default kw//2 is
    torch-style 'same' for odd kernels. Even kernels (the space_to_depth
    fold's 2k x 2k stride-2 form) pass it explicitly.
    """
    kh, kw, cin, cout = w.shape
    if pl is None:
        pl = kw // 2
    assert (s * P_out) % P_in == 0, (s, P_in, P_out)
    sp = (s * P_out) // P_in
    cols = sorted({(s * j + d - pl) // P_in for j in range(P_out) for d in range(kw)})
    c0, kwp = cols[0], cols[-1] - cols[0] + 1
    Wp = jnp.zeros((kh, kwp, P_in * cin, P_out * cout), w.dtype)
    for j in range(P_out):
        for d in range(kw):
            t = s * j + d - pl
            col = t // P_in - c0
            sub = t % P_in
            Wp = Wp.at[:, col, sub * cin:(sub + 1) * cin, j * cout:(j + 1) * cout].add(w[:, d])
    padL = -c0 * 1
    # output packed width must equal input packed width / sp exactly:
    # Wpo = (Wip + padL + padR - kwp)/sp + 1 with Wpo = Wip*P_in/(s*P_out)
    padR = None  # resolved at call site from the actual input width
    return Wp, sp, padL, kwp


def packed_conv_grouped_out(x, w, s: int, P_in: int, P_out: int, groups, b=None, act=None,
                            pl=None, ph=None):
    """packed_conv whose packed OUTPUT channels are re-grouped: each original
    out-channel group q (sizes in `groups`) becomes lane-contiguous across
    subpixels — layout [q][j][c_q] instead of [j][all-c] — so callers can
    split the result into independent P_out-packed tensors with plain lane
    slices. Used by the packed-plain C2f to emit cv1's (a, b) halves from ONE
    conv (N = P*2c dense) instead of two half-width (N = P*c) convs.

    pl / ph override the W-left and (top, bottom) H padding for non-'same'
    kernels (the space_to_depth fold's even-kernel stride-2 form).
    """
    kh = w.shape[0]
    ph = (kh // 2, kh // 2) if ph is None else ph
    cout = w.shape[-1]
    Wp, sp, padL, kwp = pack_conv_kernel(w, P_in, P_out, s, pl=pl)
    import numpy as _np

    starts = _np.cumsum([0] + list(groups))
    perm = [
        j * cout + int(starts[qi]) + o
        for qi, g in enumerate(groups)
        for j in range(P_out)
        for o in range(g)
    ]
    perm = jnp.asarray(_np.asarray(perm, _np.int32))
    wip = x.shape[2]
    wpo = wip * P_in // (s * P_out)
    padR = sp * (wpo - 1) + kwp - wip - padL
    assert padR >= 0, (kh, s, P_in, P_out, padR)
    # q8_conv barriers the kernel itself (quantized or not) — see packed_conv
    y = q8_conv(x, Wp[:, :, :, perm], (s, sp), [ph, (padL, padR)])
    if b is not None:
        y = y + jnp.tile(b, P_out)[perm]
    if act is not None:
        y = apply_act(y, act)
    return y


def packed_conv(x, w, s: int, P_in: int, P_out: int, b=None, act=None, pl=None, ph=None):
    """Exact width-packed conv: x (B, H, W/P_in, P_in*Cin) HWIO kernel w.

    pl / ph as in packed_conv_grouped_out (default torch-'same')."""
    kh = w.shape[0]
    ph = (kh // 2, kh // 2) if ph is None else ph
    Wp, sp, padL, kwp = pack_conv_kernel(w, P_in, P_out, s, pl=pl)
    wip = x.shape[2]
    wpo = wip * P_in // (s * P_out)
    padR = sp * (wpo - 1) + kwp - wip - padL
    assert padR >= 0, f"packed_conv invariant violated: padR={padR} for k={kh},s={s},P_in={P_in},P_out={P_out}"
    # q8_conv barriers the kernel (quantized or not): the scattered kernel
    # must materialize ONCE — without the barrier XLA fuses the dynamic-
    # update-slice chain into the conv fusion and recomputes the kernel
    # construction per output tile (profiled: 2.2 ms for a 1x1 packed conv
    # whose MXU+HBM cost is ~0.4 ms). Packed convs are groups=1/dilation=1
    # by construction, so they quantize under an active int8 QuantCtx too —
    # the width-packed stages carry most of v10x's FLOPs.
    y = q8_conv(x, Wp, (s, sp), [ph, (padL, padR)])
    if b is not None:
        y = y + jnp.tile(b, P_out)
    if act is not None:
        y = apply_act(y, act)
    return y


# ---------------------------------------------------------------------------
# Legacy CSP zoo (v3/v5/v6-era), HGNetv2, and ResNet graph modules.
# Behavioral specs: reference nn/modules/block.py:84-382 and conv.py:83-135.
# All NHWC flax, same variable naming as their ConvBN peers so fuse_conv_bn
# and the deploy inline fold apply unchanged.
# ---------------------------------------------------------------------------


class SPP(nn.Module):
    """Spatial pyramid pooling with parallel maxpools (reference block.py:139).

    On TPU each stride-1 maxpool is a VPU reduce_window; XLA fuses the concat
    into the following 1x1 conv's operand read.
    """

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        ys = [x]
        for k in self.k:
            p = k // 2
            ys.append(nn.max_pool(x, (k, k), strides=(1, 1), padding=[(p, p), (p, p)]))
        return ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), training
        )


class C1(nn.Module):
    """CSP bottleneck with 1 conv (reference block.py:179)."""

    c2: int
    n: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        m = y
        for i in range(self.n):
            m = ConvBN(self.c2, 3, act="mish", dtype=self.dtype, name=f"m_{i}")(m, training)
        return m + y


class C2(nn.Module):
    """CSP bottleneck with 2 convs (reference block.py:194)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(a, training)
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), training
        )


class C3x(nn.Module):
    """C3 with cross-convolutions: bottleneck kernels (1x3)->(3x1)
    (reference block.py:257)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        for i in range(self.n):
            a = Bottleneck(
                c_, self.shortcut, self.g, k=((1, 3), (3, 1)), e=1.0, dtype=self.dtype, name=f"m_{i}"
            )(a, training)
        b = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv2")(x, training)
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), training
        )


class GhostBottleneck(nn.Module):
    """Ghost bottleneck: pw GhostConv -> (dw if s=2) -> linear GhostConv,
    with a dw+pw shortcut at stride 2 (reference block.py:304)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="conv_0")(x, training)
        if self.s == 2:
            import math as _math

            y = ConvBN(c_, self.k, 2, g=_math.gcd(c_, c_), act=False, dtype=self.dtype, name="conv_1")(y, training)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, name="conv_2")(y, training)
        if self.s == 2:
            import math as _math

            sc = ConvBN(c1, self.k, 2, g=c1, act=False, dtype=self.dtype, name="shortcut_0")(x, training)
            sc = ConvBN(self.c2, 1, 1, act=False, dtype=self.dtype, name="shortcut_1")(sc, training)
        else:
            sc = x
        return y + sc


class C3Ghost(nn.Module):
    """C3 with GhostBottleneck blocks (reference block.py:294)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        for i in range(self.n):
            a = GhostBottleneck(c_, dtype=self.dtype, name=f"m_{i}")(a, training)
        b = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv2")(x, training)
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), training
        )


class BottleneckCSP(nn.Module):
    """Original CSPNet bottleneck: two raw (bias-free, BN-less) side convs and
    one shared BN over the concat (reference block.py:343)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(a, training)
        y1 = nn.Conv(
            c_, (1, 1), use_bias=False, kernel_init=kaiming_uniform(), dtype=self.dtype, name="cv3"
        )(a)
        y2 = nn.Conv(
            c_, (1, 1), use_bias=False, kernel_init=kaiming_uniform(), dtype=self.dtype, name="cv2"
        )(x)
        y = nn.BatchNorm(
            use_running_average=not training, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="bn",
        )(jnp.concatenate([y1, y2], axis=-1))
        return ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv4")(nn.silu(y), training)


class RepC3(nn.Module):
    """RT-DETR neck CSP block with RepConv bottlenecks (reference block.py:267)."""

    c2: int
    n: int = 3
    e: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        for i in range(self.n):
            a = RepConv(c_, use_identity=False, dtype=self.dtype, name=f"m_{i}")(a, training)
        b = ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv2")(x, training)
        y = a + b
        if c_ != self.c2:
            y = ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv3")(y, training)
        return y


class LightConv(nn.Module):
    """1x1 linear conv + depthwise k conv (reference conv.py:83)."""

    c2: int
    k: int = 1
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = ConvBN(self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, training)
        return ConvBN(self.c2, self.k, g=self.c2, act=self.act, dtype=self.dtype, name="conv2")(y, training)


class HGStem(nn.Module):
    """PPHGNetV2 stem: 5 convs + one stride-1 maxpool branch
    (reference block.py:84-113). The odd-size pads replicate torch's
    F.pad([0,1,0,1]) + ceil_mode pooling exactly."""

    cm: int
    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = ConvBN(self.cm, 3, 2, act="mish", dtype=self.dtype, name="stem1")(x, training)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBN(self.cm // 2, 2, 1, p=0, act="mish", dtype=self.dtype, name="stem2a")(x, training)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBN(self.cm, 2, 1, p=0, act="mish", dtype=self.dtype, name="stem2b")(x2, training)
        # MaxPool2d(k=2, s=1, ceil_mode=True): at stride 1 the output size
        # (H-k)/1 is always integral, so ceil mode adds nothing — plain
        # valid pooling matches torch exactly
        neg = jnp.finfo(jnp.float32).min if x.dtype != jnp.bfloat16 else jnp.finfo(jnp.bfloat16).min
        x1 = jax.lax.reduce_window(
            x, jnp.array(neg, x.dtype), jax.lax.max,
            (1, 2, 2, 1), (1, 1, 1, 1), [(0, 0), (0, 0), (0, 0), (0, 0)],
        )
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvBN(self.cm, 3, 2, act="mish", dtype=self.dtype, name="stem3")(x, training)
        return ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="stem4")(x, training)


class HGBlock(nn.Module):
    """PPHGNetV2 block: n chained (Light)Convs, concat all taps, then
    squeeze/excitation 1x1 convs (reference block.py:115-137)."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        ys = [x]
        for i in range(self.n):
            if self.lightconv:
                ys.append(LightConv(self.cm, self.k, dtype=self.dtype, name=f"m_{i}")(ys[-1], training))
            else:
                ys.append(ConvBN(self.cm, self.k, act="mish", dtype=self.dtype, name=f"m_{i}")(ys[-1], training))
        y = ConvBN(self.c2 // 2, 1, 1, act="mish", dtype=self.dtype, name="sc")(
            jnp.concatenate(ys, axis=-1), training
        )
        y = ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="ec")(y, training)
        if self.shortcut and x.shape[-1] == self.c2:
            return y + x
        return y


class ResNetBlock(nn.Module):
    """Standard bottleneck ResNet block (reference block.py:367)."""

    c2: int
    s: int = 1
    e: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c3 = self.e * self.c2
        y = ConvBN(self.c2, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        y = ConvBN(self.c2, 3, self.s, p=1, act="mish", dtype=self.dtype, name="cv2")(y, training)
        y = ConvBN(c3, 1, act=False, dtype=self.dtype, name="cv3")(y, training)
        if self.s != 1 or x.shape[-1] != c3:
            sc = ConvBN(c3, 1, self.s, act=False, dtype=self.dtype, name="shortcut_0")(x, training)
        else:
            sc = x
        return nn.relu(y + sc)


class ResNetLayer(nn.Module):
    """ResNet stage (reference block.py:382): is_first -> 7x7/2 conv +
    3x3/2 maxpool; else n bottleneck blocks."""

    c2: int
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.is_first:
            x = ConvBN(self.c2, 7, 2, p=3, act="mish", dtype=self.dtype, name="layer_0")(x, training)
            neg = jnp.finfo(jnp.float32).min if x.dtype != jnp.bfloat16 else jnp.finfo(jnp.bfloat16).min
            return jax.lax.reduce_window(
                x, jnp.array(neg, x.dtype), jax.lax.max,
                (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
            )
        x = ResNetBlock(self.c2, self.s, e=self.e, dtype=self.dtype, name="layer_0")(x, training)
        for i in range(1, self.n):
            x = ResNetBlock(self.c2, 1, e=self.e, dtype=self.dtype, name=f"layer_{i}")(x, training)
        return x


class ConvTransposeBN(nn.Module):
    """ConvTranspose2d + BN + SiLU (reference conv.py:117-135)."""

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    use_bn: bool = True
    act: Any = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        # torch ConvTranspose2d(p) == lax.conv_transpose dilated-input padding
        # of (k-1-p) per side: out = (H-1)*s - 2p + k
        pp = self.k - 1 - self.p
        x = nn.ConvTranspose(
            self.c2, (self.k, self.k), strides=(self.s, self.s),
            padding=[(pp, pp), (pp, pp)],
            use_bias=not self.use_bn, transpose_kernel=True,
            kernel_init=kaiming_uniform(), dtype=self.dtype, name="conv_transpose",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not training, momentum=BN_MOMENTUM, epsilon=BN_EPS,
                dtype=self.dtype, name="bn",
            )(x)
        return apply_act(x, self.act)


class C3TR(nn.Module):
    """C3 with a TransformerBlock bottleneck (reference block.py:270)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .transformer import TransformerBlock

        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        a = TransformerBlock(c_, 4, self.n, dtype=self.dtype, name="m")(a, training)
        b = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv2")(x, training)
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), training
        )


class MaxPool2d(nn.Module):
    """torch nn.MaxPool2d(k, s, p) equivalent (v3-tiny graph layers)."""

    k: int
    s: int
    p: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        return nn.max_pool(
            x, (self.k, self.k), strides=(self.s, self.s),
            padding=[(self.p, self.p), (self.p, self.p)],
        )


class ZeroPad2d(nn.Module):
    """torch nn.ZeroPad2d([l, r, t, b]) equivalent (NHWC)."""

    pads: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self, x, training: bool = False):
        l, r, t, b = self.pads
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))
