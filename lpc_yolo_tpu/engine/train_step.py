"""Jitted/pjit training step: loss, grads, optimizer, EMA, BN-stat updates.

Behavioral spec: reference engine/trainer.py:362-394 (autocast fwd, backward,
clipped step), :695-756 (build_optimizer: 3 param groups — BN/no-decay,
weights/decay, biases/no-decay), torch_utils.py:431-465 (ModelEMA: decay =
0.9999 * (1 - exp(-updates/2000))), trainer.py:366-375 (linear warmup of lr
and momentum over warmup_epochs), :252 (one_cycle/linear lf schedule).

TPU-native design: the whole step (fwd + bwd + clip + update + EMA) is ONE
XLA program. Under a data mesh the batch arrives sharded on 'data' and params
replicated; the SPMD partitioner inserts the gradient all-reduce over ICI —
there is no explicit collective in this file. BN runs per-replica statistics,
which matches DDP semantics (no SyncBN in the reference).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import v8_detection_loss, v10_detect_loss
from ..losses.segment import v8_segmentation_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_updates: jnp.ndarray  # EMA update counter (ModelEMA semantics)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class OptConfig:
    """Mirrors the reference's train-hyp keys (cfg/default.yaml)."""

    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_steps: int = 1000  # ~3 epochs in reference terms; expressed in steps
    warmup_momentum: float = 0.8
    total_steps: int = 100_000
    grad_clip: float = 10.0
    optimizer: str = "sgd"  # 'sgd' | 'adamw'
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0


def linear_lf(step: jnp.ndarray, cfg: OptConfig) -> jnp.ndarray:
    """Linear 'one_cycle=False' schedule (trainer.py:250-253): lf goes 1 -> lrf."""
    frac = jnp.clip(step / max(cfg.total_steps, 1), 0.0, 1.0)
    return (1.0 - frac) * (1.0 - cfg.lrf) + cfg.lrf


def lr_at(step: jnp.ndarray, cfg: OptConfig) -> jnp.ndarray:
    """Warmup (linear from 0) then the linear decay schedule."""
    warm = jnp.clip(step / jnp.maximum(cfg.warmup_steps, 1), 0.0, 1.0)
    return cfg.lr0 * warm * linear_lf(step, cfg)


def momentum_at(step: jnp.ndarray, cfg: OptConfig) -> jnp.ndarray:
    warm = jnp.clip(step / jnp.maximum(cfg.warmup_steps, 1), 0.0, 1.0)
    return cfg.warmup_momentum + (cfg.momentum - cfg.warmup_momentum) * warm


def _decay_mask(params) -> Any:
    """True for entries that get weight decay: conv/linear kernels only
    (reference g1 group, trainer.py:714-721; BN scale + all biases excluded)."""
    flat = jax.tree_util.tree_map_with_path(
        lambda path, x: any(getattr(k, "key", None) == "kernel" for k in path), params
    )
    return flat


def make_optimizer(params, cfg: OptConfig) -> optax.GradientTransformation:
    sched = lambda step: lr_at(step, cfg)
    if cfg.optimizer == "adamw":
        base = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(
                sched, b1=cfg.momentum, b2=0.999, weight_decay=cfg.weight_decay, mask=_decay_mask(params)
            ),
        )
        return base
    # SGD + nesterov momentum (warmed 0.8 -> momentum like trainer.py:366-375)
    # + decoupled weight decay on kernels.
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask(params)),
        optax.inject_hyperparams(optax.trace)(
            decay=lambda step: momentum_at(step, cfg), nesterov=True
        ),
        optax.scale_by_learning_rate(sched),
    )


def init_train_state(model, variables: Dict, cfg: OptConfig) -> Tuple[TrainState, optax.GradientTransformation]:
    # The train step donates the state (in-place buffer updates), so every
    # leaf must own its buffer: params/ema must not alias each other (XLA
    # rejects donating one buffer twice) and must not alias the caller's
    # `variables` (donation would invalidate them under the caller's feet).
    fresh = lambda tree: jax.tree.map(lambda x: jnp.array(x, copy=True), tree)
    tx = make_optimizer(variables["params"], cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=fresh(variables["params"]),
        batch_stats=fresh(variables["batch_stats"]),
        opt_state=tx.init(variables["params"]),
        ema_params=fresh(variables["params"]),
        ema_updates=jnp.zeros((), jnp.float32),
    )
    return state, tx


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: OptConfig,
    loss_kind: str = "v10",
) -> Callable:
    """Build the jitted train step for a DetectionModel.

    batch = {'img': (B,H,W,3) f32, 'cls': (B,M) i32, 'bboxes': (B,M,4) xyxy px,
             'mask': (B,M) bool}
    """

    train_pack = bool(getattr(model, "train_pack", False))
    stem_is_conv = bool(model.specs) and model.specs[0].module == "Conv"

    def loss_fn(params, batch_stats, batch, step=0):
        img = batch["img"]
        pre_packed = train_pack and img.ndim == 4 and img.shape[-1] == 24
        if img.dtype == jnp.uint8:
            # uint8 BGR from the loader: normalize + BGR->RGB, matching the
            # reference's Format transform (augment.py:876) + /255 preprocess.
            if train_pack and stem_is_conv:
                # fold /255 + BGR->RGB into the STEM KERNEL at trace time:
                # conv(flip(x)/255, W) == conv(x, flip(W)/255) exactly, and
                # the transform is differentiable, so grads/optimizer/EMA
                # still act on the stored kernel. The raw uint8 batch then
                # feeds the conv after a bare dtype convert — xplane showed
                # the activation-side normalize forcing a {1,2,3,0}->{0,3,2,1}
                # relayout copy of the whole input (~1.0 ms/step at v10n
                # b32) that the kernel-side fold avoids.
                if not pre_packed and img.shape[2] % 8 == 0:
                    b_, h_, w_, c_ = img.shape
                    img = img.reshape(b_, h_, w_ // 8, 8 * c_)
                    pre_packed = True
                sk = params["model_0"]["conv"]["kernel"]
                sk = sk[:, :, ::-1, :] / 255.0
                params = dict(params)
                params["model_0"] = dict(params["model_0"])
                params["model_0"]["conv"] = {**params["model_0"]["conv"], "kernel": sk}
            elif pre_packed:
                # (B, H, W/8, 8*3) feed — same bytes as NHWC (free host
                # reshape); the BGR->RGB flip happens within each 3-channel
                # group. Feeding the packed shape lets XLA lay the entry
                # parameter out for the packed stem conv directly instead of
                # relayouting a (B,640,640,3) buffer post-normalize
                # (xplane: a 0.94 ms/step copy at v10n b32).
                b_, h_, wp_, cp_ = img.shape
                img = img.reshape(b_, h_, wp_, 8, 3)[..., ::-1].reshape(b_, h_, wp_, cp_)
                img = img.astype(jnp.float32) / 255.0
            else:
                img = img.astype(jnp.float32)[..., ::-1] / 255.0
        dn = None
        if loss_kind == "rtdetr":
            # contrastive denoising queries (models/utils/ops.py:153)
            h, w = img.shape[1], img.shape[2]
            scale = jnp.array([w, h, w, h], jnp.float32)
            xyxy_n = batch["bboxes"] / scale
            cxcywh = jnp.concatenate(
                [(xyxy_n[..., :2] + xyxy_n[..., 2:]) / 2, xyxy_n[..., 2:] - xyxy_n[..., :2]], -1
            )
            dn = {
                "cls": batch["cls"],
                "bboxes": cxcywh,
                "mask": batch["mask"],
                "key": jax.random.fold_in(jax.random.PRNGKey(42), step),
            }
        if train_pack and not pre_packed:
            # feed the width-packed layout (B, H, W/8, 8*3): the low-channel
            # stem stages then run on dense 128-lane tiles (see
            # compiler._run wpack_on). The reshape fuses into the normalize.
            b_, h_, w_, c_ = img.shape
            img = img.reshape(b_, h_, w_ // 8, 8 * c_)
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img,
            training=True,
            mutable=["batch_stats"],
            dn=dn,
            input_layout="WPACK" if train_pack else "NHWC",
        )
        # mixed-precision (amp): models built with dtype=bfloat16 run the
        # backbone/neck/head matmuls in bf16 (params stay f32 — linen's
        # param dtype is separate from compute dtype); the loss math needs
        # f32 (BCE/IoU/assigner stability). The detect-family losses cast
        # at their use sites (identical numerics — the values are already
        # bf16-quantized — but the cast fuses into each consumer instead of
        # materializing a full f32 copy of every head map: xplane showed
        # two standalone (B,8400,144) converts, ~0.9 ms/step at v10n b32).
        # rtdetr's loss consumes raw logits, so it keeps the tree upcast.
        if loss_kind == "rtdetr":
            out = jax.tree.map(
                lambda t: t.astype(jnp.float32)
                if hasattr(t, "dtype") and t.dtype == jnp.bfloat16
                else t,
                out,
            )
        if loss_kind == "v10":
            total, items = v10_detect_loss(
                out, batch["cls"], batch["bboxes"], batch["mask"], model.strides, model.nc
            )
        elif loss_kind == "rtdetr":
            from ..losses.detr import rtdetr_loss

            total, items = rtdetr_loss(
                out, batch["cls"], batch["bboxes"], batch["mask"], img.shape[1:3]
            )
        elif loss_kind == "obb":
            from ..losses.obb import v8_obb_loss

            total, items = v8_obb_loss(
                out, batch["cls"], batch["rboxes"], batch["mask"], model.strides, model.nc
            )
        elif loss_kind == "pose":
            from ..losses.pose import v8_pose_loss

            kpt_shape = (batch["keypoints"].shape[-2], batch["keypoints"].shape[-1])
            total, items = v8_pose_loss(
                out, batch["cls"], batch["bboxes"], batch["mask"], batch["keypoints"],
                model.strides, model.nc, kpt_shape=kpt_shape,
            )
        elif loss_kind == "segment":
            total, items = v8_segmentation_loss(
                out, batch["cls"], batch["bboxes"], batch["mask"], batch["masks"],
                model.strides, model.nc,
            )
        else:
            feats = out["feats"] if isinstance(out, dict) else out  # Segment -> dict
            total, items_t = v8_detection_loss(
                feats, batch["cls"], batch["bboxes"], batch["mask"], model.strides, model.nc
            )
            items = jnp.stack(list(items_t))
        return total, (mut["batch_stats"], items)

    # donate the state: params/opt/EMA/BN buffers update in place on device
    # (no old+new copies coexisting — the reference gets this for free from
    # torch's mutable tensors; under XLA it must be declared). Callers always
    # rebind `state, metrics = step(state, batch)`. CPU backend ignores
    # donation with a harmless warning.
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (loss, (new_stats, items)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, state.step
        )
        # Non-finite guard (the reference gets this from GradScaler's inf
        # check, trainer.py:389-394): a NaN/inf loss or gradient skips the
        # whole update — params, optimizer state, BN stats, and EMA keep
        # their previous values — instead of poisoning the run. One fused
        # select per leaf; free when everything is finite.
        finite = jnp.isfinite(loss)
        for g in jax.tree_util.tree_leaves(grads):
            finite &= jnp.all(jnp.isfinite(g))
        grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def keep_if_finite(new, old):
            return jax.tree.map(lambda a, b: jnp.where(finite, a, b), new, old)

        new_params = keep_if_finite(new_params, state.params)
        new_opt = keep_if_finite(new_opt, state.opt_state)
        new_stats = keep_if_finite(new_stats, state.batch_stats)

        # ModelEMA (torch_utils.py:431-465): ramped decay, updated every step.
        n = state.ema_updates + jnp.where(finite, 1.0, 0.0)
        d = cfg.ema_decay * (1.0 - jnp.exp(-n / cfg.ema_tau))
        new_ema = jax.tree.map(
            lambda e, p: jnp.where(finite, e * d + (1.0 - d) * p, e), state.ema_params, new_params
        )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=new_ema,
            ema_updates=n,
        )
        metrics = {
            "loss": loss,
            "items": items,
            "lr": lr_at(state.step, cfg),
            "skipped": ~finite,
        }
        return new_state, metrics

    return train_step
