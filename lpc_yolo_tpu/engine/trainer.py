"""Trainer: the epoch loop around the jitted train step.

Behavioral spec: reference engine/trainer.py:178-685 (BaseTrainer): dataset
build, warmup LR, per-epoch val on EMA weights, best/last checkpointing, CSV
metrics log, mosaic close in the final epochs, early stopping, resume.

TPU-native design: one jitted train step (fwd+bwd+update+EMA, see
train_step.py) over a data mesh; the host loop only feeds uint8 batches and
logs. DDP's subprocess re-exec + NCCL process groups (utils/dist.py in the
reference) are replaced by mesh sharding — the same code runs on 1 chip or a
pod slice.
"""

from __future__ import annotations

import csv
import signal
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

import jax

from ..data import DataLoader, OBBTrainTransforms, PoseTrainTransforms, SegTrainTransforms, TrainTransforms, YOLODataset, check_det_dataset
from ..parallel import data_parallel_mesh, replicate, shard_batch
from ..utils.callbacks import CallbackRegistry
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from .train_step import OptConfig, init_train_state, make_train_step
from .validator import Validator

LOSS_NAMES = {
    "v10": ["box_om", "cls_om", "dfl_om", "box_oo", "cls_oo", "dfl_oo"],
    "v8": ["box", "cls", "dfl"],
    "segment": ["box", "seg", "cls", "dfl"],
    "rtdetr": ["cls", "l1", "giou"],
    "pose": ["box", "pose", "kobj", "cls", "dfl"],
    "obb": ["box", "cls", "dfl"],
}


class EarlyStopping:
    """Stop when fitness hasn't improved for `patience` epochs (torch_utils.py:568)."""

    def __init__(self, patience: int = 50):
        self.patience = patience or float("inf")
        self.best_fitness = 0.0
        self.best_epoch = 0

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_fitness = fitness
            self.best_epoch = epoch
        return (epoch - self.best_epoch) >= self.patience


class Trainer:
    def __init__(
        self,
        yolo,
        data: str,
        epochs: int = 100,
        batch: int = 16,
        imgsz: int = 640,
        lr0: float = 0.01,
        lrf: float = 0.01,
        momentum: float = 0.937,
        weight_decay: float = 5e-4,
        warmup_epochs: float = 3.0,
        optimizer: str = "auto",
        workers: int = 8,
        max_gt: int = 128,
        close_mosaic: int = 10,
        val: bool = True,
        save: bool = True,
        save_period: int = -1,
        save_dir: Optional[str] = None,
        project: Optional[str] = None,
        name: Optional[str] = None,
        exist_ok: bool = False,
        patience: int = 50,
        seed: int = 0,
        resume: bool = False,
        hyp: Optional[Dict] = None,
        cache: Any = False,  # False | 'ram' | 'disk' image cache (default.yaml 'cache')
        cache_augmented: Any = False,  # False | True | int(capacity): serve from a
        # refreshing RAM window of pre-augmented batches (data/shard_cache.py) —
        # the host-starvation mitigation for hosts that can't feed the chip
        **_: Any,
    ):
        self.cache = cache
        self.cache_augmented = cache_augmented
        self.yolo = yolo
        self.data = data
        self.epochs = epochs
        self.batch = batch
        self.imgsz = imgsz
        self.workers = workers
        self.max_gt = max_gt
        self.close_mosaic = close_mosaic
        self.do_val = val
        self.save = save
        self.save_period = save_period
        if save_dir is not None:
            # explicit save_dir wins (tests/tools); resume reuses it as-is
            self.save_dir = Path(save_dir)
        else:
            # reference run-dir semantics (cfg/__init__.py get_save_dir):
            # {project or runs/<task>}/{name or 'train'}, auto-incremented
            # train2/train3/... unless exist_ok — but resume reuses the last
            # existing run dir instead of opening a new one
            from ..utils.infra import get_save_dir

            task = getattr(yolo, "task", None) or "detect"
            self.save_dir = get_save_dir(task, "train", project, name, exist_ok)
            if resume:
                # resume reuses the newest run that actually has a checkpoint
                runs = sorted(
                    (p for p in self.save_dir.parent.glob(f"{name or 'train'}*")
                     if (p / "weights" / "last.ckpt").exists()),
                    key=lambda p: p.stat().st_mtime,
                )
                if runs:
                    self.save_dir = runs[-1]
        self.seed = seed
        self.resume = resume
        self.hyp = hyp or {}
        self.patience = patience
        self.callbacks = CallbackRegistry()
        # user hooks registered on the facade (Model.add_callback)
        for event, fns in getattr(yolo, "callbacks", {}).items():
            for fn in fns:
                self.callbacks.add(event, fn)
        # observability sinks (reference add_integration_callbacks in
        # BaseTrainer.__init__): TB if available + mlflow-filestore/dvclive/
        # jsonl (dependency-free layouts under save_dir)
        self.callbacks.add_integration_callbacks(save_dir=self.save_dir)
        self._opt_kw = dict(
            lr0=lr0, lrf=lrf, momentum=momentum, weight_decay=weight_decay,
            warmup_epochs=warmup_epochs, optimizer=optimizer,
        )

    def _autobatch(self, model, task: str, kpt_shape=None, max_batch: int = 128) -> int:
        """Resolve batch=-1: largest power-of-2 batch whose compiled train step
        fits 60% of device HBM (exact AOT probe, no execution)."""
        import jax.numpy as jnp

        from ..utils.autobatch import autobatch

        probe_cfg = OptConfig(total_steps=1000, warmup_steps=100)
        state, tx = init_train_state(model, self.yolo.variables, probe_cfg)
        step = make_train_step(model, tx, probe_cfg, loss_kind=task)
        M, sz = self.max_gt, self.imgsz

        def make_fn(b):
            batch = {
                "img": jax.ShapeDtypeStruct((b, sz, sz, 3), jnp.float32),
                "cls": jax.ShapeDtypeStruct((b, M), jnp.int32),
                "bboxes": jax.ShapeDtypeStruct((b, M, 4), jnp.float32),
                "mask": jax.ShapeDtypeStruct((b, M), jnp.bool_),
            }
            if task == "segment":
                batch["masks"] = jax.ShapeDtypeStruct((b, M, sz // 4, sz // 4), jnp.float32)
            elif task == "pose":
                k = tuple(kpt_shape or (17, 3))
                batch["keypoints"] = jax.ShapeDtypeStruct((b, M, k[0], k[1]), jnp.float32)
            elif task == "obb":
                batch["rboxes"] = jax.ShapeDtypeStruct((b, M, 5), jnp.float32)
            return step, (state, batch)

        return autobatch(make_fn, max_batch=max_batch)

    def train(self) -> Dict[str, float]:
        info = check_det_dataset(self.data)
        nc = info["nc"]
        model = self.yolo.model
        if jax.default_backend() == "tpu" and not model.train_pack:
            # width-pack the low-channel training stages (compiler._run
            # wpack_on): numerically exact (loss/grads/BN stats match the
            # unpacked graph at f64 — tests/test_train_pack.py) and +43%
            # step throughput on v5e (450 -> 642 img/s v10n b32). Same
            # variable tree; TPU-only because the packed kernels only pay
            # off on 128-lane tile hardware.
            model = model.clone(train_pack=True)
        if model.nc != nc:
            raise ValueError(
                f"model nc={model.nc} != dataset nc={nc}; build the model with YOLO(cfg, nc={nc})"
            )

        mods = {s.module for s in model.specs}
        if "v10Detect" in mods:
            task = "v10"
        elif "RTDETRDecoder" in mods:
            task = "rtdetr"
        elif "Segment" in mods:
            task = "segment"
        elif "Pose" in mods:
            task = "pose"
        elif "OBB" in mods:
            task = "obb"
        else:
            task = "v8"
        kpt_shape = info.get("kpt_shape")
        if self.batch == -1:
            # reference autobatch (utils/autobatch.py:13-70): probe the largest
            # batch that fits 60% of HBM. CUDA's try-and-OOM loop becomes an
            # exact XLA AOT memory_analysis of the real train step here.
            self.batch = self._autobatch(model, task, kpt_shape)
            print(f"autobatch: using batch={self.batch}")
        dataset = YOLODataset(
            info["train"], imgsz=self.imgsz, augment=True, names=info["names"],
            kpt_shape=kpt_shape, obb=(task == "obb"), cache_images=self.cache,
        )
        if task == "segment":
            transforms = SegTrainTransforms(self.imgsz, self.hyp, self.max_gt)
        elif task == "pose":
            transforms = PoseTrainTransforms(
                self.imgsz, self.hyp, self.max_gt, kpt_shape or (17, 3), flip_idx=info.get("flip_idx")
            )
        elif task == "obb":
            transforms = OBBTrainTransforms(self.imgsz, self.hyp, self.max_gt)
        else:
            transforms = TrainTransforms(self.imgsz, self.hyp, self.max_gt)
        loader = DataLoader(
            dataset, transforms, batch_size=self.batch, shuffle=True,
            workers=self.workers, seed=self.seed, infinite=True,
        )
        steps_per_epoch = max(len(loader), 1)
        total_steps = steps_per_epoch * self.epochs

        opt_name = self._opt_kw["optimizer"]
        if opt_name == "auto":
            # reference build_optimizer: AdamW for short runs, SGD otherwise
            opt_name = "adamw" if total_steps <= 10000 and nc <= 20 else "sgd"
            lr0 = 0.002 if opt_name == "adamw" else self._opt_kw["lr0"]
        else:
            lr0 = self._opt_kw["lr0"]
        cfg = OptConfig(
            lr0=lr0,
            lrf=self._opt_kw["lrf"],
            momentum=self._opt_kw["momentum"] if opt_name == "sgd" else 0.9,
            weight_decay=self._opt_kw["weight_decay"],
            warmup_steps=max(int(self._opt_kw["warmup_epochs"] * steps_per_epoch), 100),
            total_steps=total_steps,
            optimizer=opt_name,
        )

        variables = self.yolo.variables
        state, tx = init_train_state(model, variables, cfg)
        start_epoch = 0
        ckpt_last = self.save_dir / "weights" / "last.ckpt"
        ckpt_best = self.save_dir / "weights" / "best.ckpt"
        if self.resume and ckpt_last.exists():
            state, meta = load_checkpoint(ckpt_last, state)
            start_epoch = int(meta.get("epoch", -1)) + 1

        train_step = make_train_step(model, tx, cfg, loss_kind=task)
        loss_names = LOSS_NAMES.get(task, LOSS_NAMES["v8"])

        mesh = data_parallel_mesh(batch_size=self.batch)
        state = replicate(state, mesh)

        stopper = EarlyStopping(self.patience)
        best_fitness = 0.0
        self.save_dir.mkdir(parents=True, exist_ok=True)
        csv_path = self.save_dir / "results.csv"
        validator = Validator(
            self.yolo, imgsz=self.imgsz, batch=min(self.batch, 8), max_gt=self.max_gt, workers=self.workers
        )

        self.callbacks.run("on_train_start", self)
        # Preemption safety (TPU-pool/maintenance evictions send SIGTERM; the
        # reference has no equivalent — DDP just dies, trainer.py:204-209):
        # on SIGTERM/SIGINT finish the current step, checkpoint, and exit
        # cleanly so `resume=True` continues from the interrupted epoch.
        self._preempted = False
        old_handlers = {}

        def _request_stop(signum, frame):
            self._preempted = True

        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                old_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:  # not the main thread (e.g. demo/server embedding)
            old_handlers = {}

        aug_cache = None
        if self.cache_augmented:
            from ..data.shard_cache import AugmentedCache

            capacity = (
                int(self.cache_augmented)
                if not isinstance(self.cache_augmented, bool)
                else min(steps_per_epoch, 16)
            )
            aug_cache = AugmentedCache(loader, capacity=capacity, seed=self.seed)
            data_iter = iter(aug_cache)
        else:
            data_iter = iter(loader)
        for epoch in range(start_epoch, self.epochs):
            self.epoch = epoch
            self.callbacks.run("on_train_epoch_start", self)
            if epoch == self.epochs - self.close_mosaic:
                transforms.close_mosaic()
                if aug_cache is not None:
                    # stale mosaic batches must not leak into the final epochs
                    aug_cache.invalidate()
            t0 = time.time()
            mean_items = np.zeros(6)
            n_skipped = 0
            input_wait_s = 0.0  # host-pipeline starvation visibility
            for _ in range(steps_per_epoch):
                tw = time.perf_counter()
                batch = next(data_iter)
                input_wait_s += time.perf_counter() - tw
                keys = ["img", "cls", "bboxes", "mask"]
                keys += [k for k in ("masks", "keypoints", "rboxes") if k in batch]
                host_batch = {k: batch[k] for k in keys}
                img = host_batch["img"]
                # C==3 gate matches train_step's packed-feed detection (last
                # dim == 24); non-RGB inputs must ship unpacked or they'd be
                # packed twice
                if model.train_pack and img.ndim == 4 and img.shape[2] % 8 == 0 and img.shape[-1] == 3:
                    # ship the width-packed (B, H, W/8, 8*C) layout — the same
                    # bytes (free numpy reshape), but XLA lays the entry
                    # parameter out for the packed stem conv directly instead
                    # of relayouting post-transfer (xplane: 0.94 ms/step at
                    # v10n b32)
                    b_, h_, w_, c_ = img.shape
                    host_batch["img"] = img.reshape(b_, h_, w_ // 8, 8 * c_)
                device_batch = shard_batch(host_batch, mesh)
                state, metrics = train_step(state, device_batch)
                it = np.asarray(metrics["items"]).reshape(-1)[:6]
                mean_items[: len(it)] += it / steps_per_epoch
                n_skipped += int(np.asarray(metrics["skipped"]))
                if self._preempted:
                    break
            if n_skipped:
                print(f"WARNING: {n_skipped}/{steps_per_epoch} steps skipped (non-finite loss/grads)")
            if self._preempted:
                # epoch incomplete: checkpoint as "before this epoch" so
                # resume re-runs it from the top
                save_checkpoint(ckpt_last, jax.device_get(state), {"epoch": epoch - 1, "fitness": best_fitness})
                print(f"preempted at epoch {epoch}: checkpoint saved, resume with resume=True")
                break

            results: Dict[str, float] = {}
            if self.do_val and info.get("val"):
                val_vars = {"params": jax.device_get(state.ema_params), "batch_stats": jax.device_get(state.batch_stats)}
                results = validator(self.data, model=model, variables=val_vars)
            fitness = results.get("fitness", 0.0)
            is_best = results and fitness >= best_fitness
            if fitness >= best_fitness:
                best_fitness = fitness
            # Checkpointing (reference trainer.py:500-507): last + (best when the
            # val fitness improved) every epoch unless save=False, plus an
            # epoch{N} snapshot every save_period epochs. One device_get serves
            # all writes — over the axon tunnel the transfer (~5 s for v10n
            # state) dwarfs both the 4 ms step and the msgpack write.
            final_epoch = epoch == self.epochs - 1
            if self.save or final_epoch:
                host_state = jax.device_get(state)
                meta = {"epoch": epoch, "fitness": fitness}
                if is_best:
                    save_checkpoint(ckpt_best, host_state, meta)
                save_checkpoint(ckpt_last, host_state, meta)
                if self.save_period > 0 and epoch > 0 and epoch % self.save_period == 0:
                    save_checkpoint(ckpt_last.with_name(f"epoch{epoch}.ckpt"), host_state, meta)
                self.callbacks.run("on_model_save", self)

            row = {
                "epoch": epoch,
                **{f"train/{n}": round(float(v), 5) for n, v in zip(loss_names, mean_items)},
                **{k: round(float(v), 5) for k, v in results.items()},
                "lr": float(metrics["lr"]),
                "time_s": round(time.time() - t0, 1),
                # fraction of the epoch spent blocked on the host augmentation
                # pipeline (time in next(loader) / wall): > ~0.3 means the chip
                # is input-starved — raise workers, cache='ram', or pre-augment
                # (the step itself syncs per iteration via the metrics fetch,
                # so loader wait is real starvation, not pipelined slack)
                "input_wait_frac": round(input_wait_s / max(time.time() - t0, 1e-9), 4),
            }
            write_header = not csv_path.exists()
            with open(csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(row))
                if write_header:
                    w.writeheader()
                w.writerow(row)
            print(
                f"epoch {epoch + 1}/{self.epochs} "
                + " ".join(f"{n}={v:.3f}" for n, v in zip(loss_names, mean_items))
                + (f" mAP50-95={results.get('metrics/mAP50-95(B)', 0):.4f}" if results else "")
            )
            self.last_metrics = row
            self.callbacks.run("on_fit_epoch_end", self)
            if stopper(epoch, fitness):
                print(f"early stop at epoch {epoch} (best epoch {stopper.best_epoch})")
                break

        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        if aug_cache is not None:
            aug_cache.stop()
            print(
                f"aug cache: echo factor {aug_cache.echo_factor():.2f} "
                f"({aug_cache.refreshed} refreshed / {aug_cache.served} served)"
            )
        self.callbacks.run("on_train_end", self)
        # final: load best into the facade (reference final_eval semantics)
        self.yolo.variables = {
            "params": jax.device_get(state.ema_params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        self.state = state
        return results
