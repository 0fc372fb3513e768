"""Classification task train/val loops.

Behavioral spec: reference models/yolo/classify/{train,val}.py — CE loss
training over ImageFolder datasets, top1/top5 accuracy validation
(ClassifyMetrics, utils/metrics.py:1230-1280).
"""

from __future__ import annotations

import csv
import time
from pathlib import Path
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data import ClassificationDataset, ClsTransforms, DataLoader, check_cls_dataset
from ..parallel import data_parallel_mesh, replicate, shard_batch
from ..utils.checkpoint import save_checkpoint
from .train_step import OptConfig, TrainState, init_train_state, lr_at


def make_cls_train_step(model, tx, cfg: OptConfig):
    def loss_fn(params, batch_stats, batch):
        img = batch["img"].astype(jnp.float32)[..., ::-1] / 255.0
        logits, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, img, training=True, mutable=["batch_stats"]
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, batch["label"]).mean()
        return loss, mut["batch_stats"]

    @jax.jit
    def step(state: TrainState, batch):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        n = state.ema_updates + 1.0
        d = cfg.ema_decay * (1.0 - jnp.exp(-n / cfg.ema_tau))
        ema = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p, state.ema_params, params)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=new_opt, ema_params=ema, ema_updates=n,
        )
        return new_state, {"loss": loss, "lr": lr_at(state.step, cfg)}

    return step


def evaluate_classifier(model, variables, split_dir, imgsz: int = 224, batch: int = 32, workers: int = 4) -> Dict[str, float]:
    """top1/top5 accuracy (ClassifyMetrics semantics)."""
    ds = ClassificationDataset(split_dir, imgsz=imgsz)
    loader = DataLoader(ds, ClsTransforms(imgsz), batch_size=batch, shuffle=False, workers=workers, infinite=False)

    @jax.jit
    def infer(variables, img_u8):
        x = img_u8.astype(jnp.float32)[..., ::-1] / 255.0
        return model.apply(variables, x, training=False)["probs"]

    top1 = top5 = n = 0
    for b in loader:
        probs = np.asarray(infer(variables, jnp.asarray(b["img"])))
        n_real = len(probs) - b["pad_count"]
        for j in range(n_real):
            order = np.argsort(-probs[j])
            label = b["label"][j]
            top1 += int(order[0] == label)
            top5 += int(label in order[:5])
            n += 1
    return {"metrics/accuracy_top1": top1 / max(n, 1), "metrics/accuracy_top5": top5 / max(n, 1),
            "fitness": top1 / max(n, 1)}


def train_classifier(
    yolo,
    data: str,
    epochs: int = 10,
    batch: int = 32,
    imgsz: int = 224,
    lr0: float = 0.002,
    workers: int = 4,
    save_dir: str = "runs/classify/train",
    **_,
) -> Dict[str, float]:
    info = check_cls_dataset(data)
    model = yolo.model
    if model.nc != info["nc"]:
        raise ValueError(f"model nc={model.nc} != dataset nc={info['nc']}; use YOLO(cfg, nc={info['nc']})")
    ds = ClassificationDataset(info["train"], imgsz=imgsz, names=info["names"])
    loader = DataLoader(ds, ClsTransforms(imgsz, augment=True), batch_size=batch, workers=workers, infinite=True)
    steps = max(len(loader), 1)
    cfg = OptConfig(lr0=lr0, optimizer="adamw", total_steps=steps * epochs, warmup_steps=max(steps, 20))
    state, tx = init_train_state(model, yolo.variables, cfg)
    step_fn = make_cls_train_step(model, tx, cfg)
    mesh = data_parallel_mesh(batch_size=batch)
    state = replicate(state, mesh)

    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    results: Dict[str, float] = {}
    it = iter(loader)
    for epoch in range(epochs):
        t0, mean_loss = time.time(), 0.0
        for _ in range(steps):
            b = next(it)
            db = shard_batch({"img": b["img"], "label": b["label"]}, mesh)
            state, m = step_fn(state, db)
            mean_loss += float(m["loss"]) / steps
        val_vars = {"params": jax.device_get(state.ema_params), "batch_stats": jax.device_get(state.batch_stats)}
        if "val" in info:
            results = evaluate_classifier(model, val_vars, info["val"], imgsz, batch, workers)
        save_checkpoint(save_dir / "weights" / "last.ckpt", jax.device_get(state), {"epoch": epoch})
        row = {"epoch": epoch, "train/loss": round(mean_loss, 5),
               **{k: round(v, 5) for k, v in results.items()}, "time_s": round(time.time() - t0, 1)}
        csv_path = save_dir / "results.csv"
        new = not csv_path.exists()
        with open(csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if new:
                w.writeheader()
            w.writerow(row)
        print(f"epoch {epoch + 1}/{epochs} loss={mean_loss:.4f} " +
              (f"top1={results.get('metrics/accuracy_top1', 0):.3f}" if results else ""))
    yolo.variables = {"params": jax.device_get(state.ema_params), "batch_stats": jax.device_get(state.batch_stats)}
    return results
