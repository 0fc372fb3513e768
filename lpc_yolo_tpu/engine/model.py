"""The `YOLO` facade: one object that loads a model (YAML or torch .pt
checkpoint) and dispatches train/val/predict/export.

Behavioral spec: reference engine/model.py:17-823 (Model), models/yolov10/
model.py:10-35 (YOLOv10 + task_map). The facade resolves the model source:
  * "*.yaml"  -> fresh build via the YAML->graph compiler (random init)
  * "*.pt"    -> torch checkpoint: architecture rebuilt from the embedded
                 yaml, weights ported to flax (utils/torch_port.py)
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..nn import build_model
from ..utils.names import COCO80
from .predictor import Predictor

_CFG_ROOT = Path(__file__).resolve().parents[1] / "cfg" / "models"


def _jit_init(model):
    """Initialize under jit: one compiled program instead of thousands of
    eagerly-dispatched ops (critical over the tunneled TPU, where per-op
    dispatch latency makes unjitted init take minutes)."""
    return jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    )()


def _resolve_yaml(name: str) -> Path:
    """Resolve a model-config name to a file, stripping the scale letter when
    needed ('yolov8n-seg.yaml' -> yolov8-seg.yaml; reference tasks.py:1069)."""
    import re

    p = Path(name)
    if p.exists():
        return p
    unified = re.sub(r"(\d+)([nsmblx])(.+)?$", r"\1\3", p.stem) + p.suffix
    for fam in ("v10", "v8", "v9"):
        for cand in (_CFG_ROOT / fam / p.name, _CFG_ROOT / fam / unified):
            if cand.exists():
                return cand
    raise FileNotFoundError(f"model config {name} not found (searched {_CFG_ROOT})")


class YOLO:
    """User-facing model facade (`YOLO('yolov10n.yaml')` / `YOLO('yolov10n.pt')`)."""

    def __init__(self, model: Union[str, Path] = "yolov10n.yaml", task: Optional[str] = None, nc: Optional[int] = None):
        self.ckpt_path = str(model)
        self.overrides: Dict[str, Any] = {}
        # user callback hooks, merged into each Trainer's event bus
        # (reference Model.add_callback, engine/model.py:769)
        self.callbacks: Dict[str, list] = {}
        self.names = dict(COCO80)
        self.model_yaml: Optional[Dict] = None
        if str(model).endswith(".pt"):
            self._load_checkpoint(str(model), nc=nc)
        elif str(model).endswith(".ckpt"):
            self._load_native_ckpt(str(model), nc=nc, task=task)
        else:
            import re

            from ..nn.compiler import yaml_model_load

            yaml_path = _resolve_yaml(str(model))
            d = yaml_model_load(yaml_path)
            m = re.search(r"yolov\d+([nsmblx])", Path(str(model)).stem)
            if m:  # scale letter from the requested name, not the unified file
                d["scale"] = m.group(1)
            self.model = build_model(d, nc=nc)
            self.model_yaml = d
            self.variables = _jit_init(self.model)
            self.task = task or self._guess_task(yaml_path)
        if self.model.nc != len(self.names):
            self.names = {i: str(i) for i in range(self.model.nc)}
        self.txt_feats = None
        if self.task == "world":
            from ..utils.text_embed import encode_names

            self.txt_feats = encode_names([self.names[i] for i in sorted(self.names)])[None]

    def _load_native_ckpt(self, path: str, nc: Optional[int] = None, task: Optional[str] = None):
        """Load an exported native checkpoint (export format='ckpt'): the meta
        header embeds the model YAML, so the architecture rebuilds without
        the original config file."""
        import json

        with open(path, "rb") as f:
            n = int.from_bytes(f.read(8), "little")
            meta = json.loads(f.read(n).decode())
        d = meta.get("model_yaml")
        if d is None:
            raise ValueError(
                f"{path} has no embedded model config — trainer state checkpoints "
                "(weights/last.ckpt) resume via YOLO(...).train(resume=True); use "
                "model.export(format='ckpt') to produce a standalone loadable artifact"
            )
        from ..utils.checkpoint import load_checkpoint

        self.model = build_model(d, nc=nc or meta.get("nc"))
        self.model_yaml = d
        template = _jit_init(self.model)
        self.variables, _ = load_checkpoint(path, template)
        mods = {s.module for s in self.model.specs}
        self.task = task or meta.get("task") or next(
            (t for m, t in (("v10Detect", "v10"), ("RTDETRDecoder", "rtdetr"), ("Segment", "segment"),
                            ("Pose", "pose"), ("OBB", "obb"), ("Classify", "classify")) if m in mods),
            "v8",
        )
        if meta.get("names"):
            self.names = {int(k): v for k, v in meta["names"].items()} if isinstance(meta["names"], dict) else dict(enumerate(meta["names"]))

    @staticmethod
    def _guess_task(yaml_path: Path) -> str:
        text = Path(yaml_path).read_text()
        for key, task in (
            ("v10Detect", "v10"), ("RTDETRDecoder", "rtdetr"), ("WorldDetect", "world"),
            ("Segment", "segment"), ("Pose", "pose"), ("OBB", "obb"), ("Classify", "classify"),
        ):
            if key in text:
                return task
        return "v8"

    def set_classes(self, names, embeddings=None):
        """Open-vocabulary class set for world models (WorldModel.set_classes,
        nn/tasks.py:578-590). embeddings: optional (M, 512) real text features
        (e.g. CLIP); otherwise a deterministic stand-in table is used."""
        if self.task != "world":
            raise ValueError("set_classes is only supported on world models")
        from ..utils.text_embed import encode_names

        self.names = dict(enumerate(map(str, names)))
        self.txt_feats = encode_names(list(map(str, names)), embeddings=embeddings)[None]  # (1, M, 512)

    def _load_checkpoint(self, path: str, nc: Optional[int] = None):
        """Load a reference-format torch checkpoint (.pt) and port weights.

        Checkpoint layout per reference trainer.py:479-506: dict with 'model'
        (the fp16 nn.Module) or 'ema'; model.yaml holds the architecture dict.
        """
        import torch

        from ..utils.torch_port import port_state_dict

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        tmodel = ckpt.get("ema") or ckpt["model"] if isinstance(ckpt, dict) else ckpt
        tmodel = tmodel.float()
        yaml_dict = dict(tmodel.yaml)
        if "scale" not in yaml_dict or not yaml_dict.get("scale"):
            import re

            m = re.search(r"yolov\d+([nsmblx])", Path(path).stem)
            if m:
                yaml_dict["scale"] = m.group(1)
        self.model = build_model(yaml_dict, nc=nc)
        init_vars = _jit_init(self.model)
        self.variables = port_state_dict(tmodel.state_dict(), init_vars)
        names = getattr(tmodel, "names", None)
        if isinstance(names, dict):
            self.names = {int(k): str(v) for k, v in names.items()}
        mods = {s.module for s in self.model.specs}
        for key, task in (
            ("v10Detect", "v10"), ("RTDETRDecoder", "rtdetr"), ("Segment", "segment"),
            ("Pose", "pose"), ("OBB", "obb"), ("Classify", "classify"),
        ):
            if key in mods:
                self.task = task
                break
        else:
            self.task = "v8"

    # ------------------------------------------------------------------ modes
    def predict(
        self,
        source,
        conf: float = 0.25,
        iou: float = 0.45,
        imgsz: int = 640,
        batch: int = 1,
        max_det: int = 300,
        stream: bool = False,
        **kw,
    ):
        save_kw = {
            k: kw[k]
            for k in ("save", "save_txt", "save_conf", "save_crop", "save_dir",
                      "project", "name", "exist_ok")
            if k in kw
        }
        predictor = Predictor(
            self.model,
            self.variables,
            task=self.task,
            imgsz=imgsz,
            batch=batch,
            conf=conf,
            iou=iou,
            max_det=max_det,
            names=self.names,
            text=jnp.asarray(self.txt_feats) if self.txt_feats is not None else None,
            **save_kw,
        )
        return predictor(source, stream=stream)

    def __call__(self, source, **kw):
        return self.predict(source, **kw)

    def track(
        self,
        source,
        tracker: str = "bytetrack.yaml",
        conf: float = 0.1,
        stream: bool = False,
        persist: bool = False,
        **kw,
    ):
        """Streaming tracking (engine/model.py:443-482: conf>=0.1, batch=1)."""
        from ..trackers.track import track_stream

        results = self.predict(source, conf=conf, batch=1, stream=True, **kw)
        gen = track_stream(results, tracker_cfg=tracker, persist=persist)
        return gen if stream else list(gen)

    def val(self, data: Optional[str] = None, **kw):
        from .validator import Validator

        v = Validator(self, **kw)
        return v(data)

    def train(self, **kw):
        if self.task == "classify":
            from .classify import train_classifier

            return train_classifier(self, **kw)
        from .trainer import Trainer

        t = Trainer(self, **kw)
        return t.train()

    def export(self, format: str = "tflite", imgsz: int = 640, batch: int = 1, **kw) -> str:
        """Export to a deployable artifact; returns its path (engine/model.py:561)."""
        from .exporter import export_model

        return export_model(self, fmt=format, imgsz=imgsz, batch=batch, **kw)

    def benchmark(self, data: Optional[str] = None, imgsz: int = 640, **kw):
        """Export-all-formats benchmark table (utils/benchmarks.py:44 semantics)."""
        from ..utils.benchmarks import benchmark

        return benchmark(self, data=data, imgsz=imgsz, **kw)

    def tune(self, data: str, iterations: int = 10, epochs: int = 10, **kw):
        """Mutation-evolution hyperparameter tuning (engine/tuner.py semantics).

        Fresh models are rebuilt from this facade's source per trial.
        """
        from .tuner import Tuner

        src, task, nc = self.ckpt_path, self.task, self.model.nc
        tuner = Tuner(save_dir=kw.pop("save_dir", "runs/tune"))
        return tuner(lambda: YOLO(src, task=task, nc=nc), data, iterations=iterations, epochs=epochs, **kw)

    def fuse(self) -> "YOLO":
        """Fold BN into conv weights for deploy (BaseModel.fuse semantics)."""
        from ..nn.fuse import fuse_conv_bn

        self.variables = fuse_conv_bn(self.variables)
        return self

    def quantize_int8(self, calib, imgsz: int = 640, batch: int = 8) -> "YOLO":
        """Post-training int8 quantization of the deploy serving graph.

        Runs the serving trace in record mode over `calib` (any
        predict()-compatible source: image paths, dirs, ndarrays, ...) to
        capture per-site activation ranges, then rebinds the model so every
        subsequent predict()/val() serves eligible convs on the int8 MXU
        path (2x bf16 peak on v5e). Same PTQ contract as the reference's
        TFLite/TensorRT int8 calibration (reference engine/exporter.py:657-700
        TRT int8, :845-880 TFLite representative-dataset int8), executed
        natively on the TPU serving graph (nn/quant.py).

        Calibrate with the SAME batch size you will serve at: the width-pack
        planner is batch-aware.
        """
        import numpy as np

        from ..nn.quant import calibrate_serving
        from ..ops.letterbox import letterbox_image
        from .predictor import load_source

        frames = load_source(calib)
        if not frames:
            raise ValueError("int8 calibration needs at least one image")
        batches = []
        for i in range(0, len(frames), batch):
            chunk = frames[i : i + batch]
            arr = np.full((batch, imgsz, imgsz // 8, 24), 114, np.uint8)
            for j, (_, im0) in enumerate(chunk):
                lb, _, _ = letterbox_image(im0, (imgsz, imgsz))
                arr[j] = lb.reshape(imgsz, imgsz // 8, 24)
            batches.append(arr)
        scales = calibrate_serving(self.model, self.variables, batches)
        # deploy stays False on the facade model (training is unaffected:
        # quant only activates on the deploy graph); Predictor/Validator
        # clone with deploy=True and inherit the quant fields
        self.model = self.model.clone(quant="int8", quant_scales=scales)
        return self

    # -- callback hooks (reference Model.add_callback/clear_callback/
    #    reset_callbacks, engine/model.py:769-800); the Trainer merges these
    #    into its event bus --
    def add_callback(self, event: str, func) -> None:
        self.callbacks.setdefault(event, []).append(func)

    def clear_callback(self, event: str) -> None:
        self.callbacks[event] = []

    def reset_callbacks(self) -> None:
        self.callbacks = {}

    def save(self, filename: Union[str, Path] = "saved_model.ckpt") -> str:
        """Persist weights+metadata as a native .ckpt loadable by YOLO()
        (reference Model.save, engine/model.py:283)."""
        from ..utils.checkpoint import save_checkpoint

        meta = {"nc": self.model.nc, "task": self.task,
                "model_yaml": self.model_yaml, "names": self.names}
        save_checkpoint(Path(filename), self.variables, meta)
        return str(filename)

    def load(self, weights: Union[str, Path, "YOLO"]) -> "YOLO":
        """Transfer weights into this model wherever path AND shape match
        (reference Model.load -> intersect_dicts semantics: partial transfer
        for fine-tuning a model with a different head)."""
        other = weights if isinstance(weights, YOLO) else YOLO(str(weights))
        flat_o = dict(jax.tree_util.tree_flatten_with_path(other.variables)[0])

        def pick(path, leaf):
            src = flat_o.get(path)
            return src if src is not None and src.shape == leaf.shape else leaf

        self.variables = jax.tree_util.tree_map_with_path(pick, self.variables)
        return self

    def reset_weights(self) -> "YOLO":
        """Re-initialize all parameters/BN stats (reference Model.reset_weights)."""
        self.variables = _jit_init(self.model)
        return self

    def embed(self, source, imgsz: int = 224, batch: int = 1):
        """Feature embeddings for source images (reference Model.embed,
        engine/model.py:370: predict with embed=[penultimate]): the graph up
        to the layer before the head, global-average-pooled and L2-normalized.
        Returns one 1-D np.ndarray per image."""
        from ..nn.compiler import DetectionModel

        from .predictor import load_source
        from ..ops.letterbox import letterbox_image

        specs = self.model.specs[:-1]
        keep = {f"model_{s.i}" for s in specs}
        trunk = DetectionModel(specs=specs, save=self.model.save, nc=self.model.nc,
                               strides=self.model.strides,
                               default_act=self.model.default_act, dtype=self.model.dtype)
        tvars = {c: {k: v for k, v in self.variables[c].items() if k in keep}
                 for c in ("params", "batch_stats") if c in self.variables}

        @jax.jit
        def run(imgs_u8):
            x = imgs_u8.astype(jnp.float32)[..., ::-1] / 255.0  # BGR->RGB
            feat = trunk.apply(tvars, x, training=False)
            emb = jnp.mean(feat, axis=(1, 2))
            return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-20)

        frames = load_source(source)
        out = []
        for i in range(0, len(frames), batch):
            chunk = frames[i : i + batch]
            arr = np.stack([letterbox_image(im, (imgsz, imgsz))[0] for _, im in chunk])
            pad = batch - len(chunk)
            if pad:
                arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
            emb = np.asarray(run(jnp.asarray(arr)))
            out.extend(emb[: len(chunk)])
        return out

    @property
    def device(self) -> str:
        """The accelerator backing jitted calls (reference Model.device)."""
        d = jax.devices()[0]
        return f"{d.platform}:{d.id}"

    @property
    def task_map(self) -> Dict[str, Dict[str, Any]]:
        """task -> engine components (reference Model.task_map via subclasses)."""
        from .predictor import Predictor
        from .trainer import Trainer
        from .validator import Validator

        return {
            t: {"trainer": Trainer, "validator": Validator, "predictor": Predictor}
            for t in ("detect", "v8", "v10", "segment", "pose", "obb", "classify",
                      "rtdetr", "world")
        }

    @staticmethod
    def is_hub_model(model: str) -> bool:
        """True for Ultralytics-HUB model references (reference Model.is_hub_model)."""
        s = str(model)
        return s.startswith("https://hub.ultralytics.com/models/") or (
            len(s) in (20, 42) and not Path(s).exists() and all(c.isalnum() for c in s)
        )

    @staticmethod
    def is_triton_model(model: str) -> bool:
        """True for Triton-server URLs (reference Model.is_triton_model)."""
        from urllib.parse import urlsplit

        u = urlsplit(str(model))
        return u.scheme in ("http", "grpc") and bool(u.netloc) and bool(u.path)

    @property
    def n_params(self) -> int:
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(self.variables["params"]))

    def info(self, imgsz: int = 640, verbose: bool = True) -> Dict[str, Any]:
        """Model summary (reference Model.info / model_info, torch_utils.py):
        layer count, parameter count, and forward GFLOPs via XLA's own cost
        analysis (the thop analog)."""
        from ..utils.profilers import model_cost

        cost = model_cost(self.model, self.variables, imgsz=imgsz)
        out = {
            "layers": len(self.model.specs),
            "parameters": self.n_params,
            "GFLOPs": cost["gflops/img"],
        }
        if verbose:
            print(
                f"{Path(self.ckpt_path).stem} summary: {out['layers']} layers, "
                f"{out['parameters']:,} parameters, {out['GFLOPs']} GFLOPs (imgsz={imgsz})"
            )
        return out

    def profile(self, imgsz: int = 640, batch: int = 1, verbose: bool = True):
        """Per-layer FLOPs/params table (reference `predict(profile=True)` →
        BaseModel._profile_one_layer, nn/tasks.py:121-144) via truncated-graph
        XLA cost analysis."""
        from ..utils.profilers import profile_layers

        return profile_layers(self.model, self.variables, imgsz=imgsz, batch=batch, verbose=verbose)

    @classmethod
    def from_pretrained(cls, source: str, **kw) -> "YOLO":
        """Load pretrained weights (reference YOLOv10's HF-Hub mixin,
        models/yolov10/model.py:10). Accepts a local .pt/.ckpt file, a
        directory containing one, or an https URL (fetched through
        utils.downloads.safe_download — requires network egress)."""
        p = Path(source)
        if p.is_dir():
            cands = sorted(list(p.glob("*.pt")) + list(p.glob("*.ckpt")))
            if not cands:
                raise FileNotFoundError(f"no .pt/.ckpt weights found under {p}")
            return cls(str(cands[0]), **kw)
        if p.exists():
            return cls(str(p), **kw)
        if str(source).startswith(("http://", "https://")):
            from ..utils.downloads import safe_download

            dest = Path.home() / ".cache" / "lpc_yolo_tpu" / Path(source).name
            safe_download(str(source), dest)
            return cls(str(dest), **kw)
        raise FileNotFoundError(
            f"from_pretrained('{source}'): not a local file/dir or URL. Hub repo-id "
            "resolution needs network egress; download the weights and pass a path."
        )
