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
