"""AutoBackend: uniform `forward(images)` over every artifact this framework
produces (live flax model, .ckpt, .stablehlo, TFLite, SavedModel).

Behavioral spec: reference ultralytics/nn/autobackend.py:53-620 — runtime
dispatch on the weights suffix with one forward signature and warmup(). The
reference's 12 vendor runtimes map onto the TPU build's artifact set; formats
whose toolchains aren't present raise at load with a clear message.
"""

from __future__ import annotations

from pathlib import Path


import numpy as np

import jax
import jax.numpy as jnp


class AutoBackend:
    """Loads any supported artifact and exposes forward(imgs_f32_nhwc) -> (B, max_det, 6)."""

    def __init__(self, weights: str, imgsz: int = 640):
        self.path = str(weights)
        self.imgsz = imgsz
        suffix = Path(self.path).suffix.lower()
        name = Path(self.path).name
        if suffix == ".stablehlo":
            from ..engine.exporter import load_stablehlo

            call = load_stablehlo(self.path)

            def fn(x):
                out = call(np.asarray(x, np.float32))
                if isinstance(out, dict):  # task-complete artifact (seg/pose)
                    return {k: np.asarray(v) for k, v in out.items()} if len(out) > 1 \
                        else np.asarray(next(iter(out.values())))
                return np.asarray(out)

            self._fn = fn
            self.kind = "stablehlo"
        elif suffix == ".tflite":
            import json

            import tensorflow as tf

            self._interp = tf.lite.Interpreter(model_path=self.path)
            self._interp.allocate_tensors()
            self._in = self._interp.get_input_details()[0]
            self._outs = self._interp.get_output_details()
            # name recovery for multi-output (seg/pose) artifacts: TFLite
            # mangles tensor names, so the exporter sidecar maps by shape
            sidecar = Path(self.path + ".json")
            shape_to_name = {}
            if sidecar.exists():
                spec = json.loads(sidecar.read_text())
                for k, shp in spec.get("output_shapes", {}).items():
                    shape_to_name[tuple(shp)] = k

            def fn(x):
                self._interp.set_tensor(self._in["index"], np.asarray(x, np.float32))
                self._interp.invoke()
                outs = [self._interp.get_tensor(d["index"]) for d in self._outs]
                if len(outs) == 1:
                    return outs[0]
                named = {shape_to_name.get(tuple(o.shape), f"output_{i}"): o
                         for i, o in enumerate(outs)}
                return named

            self._fn = fn
            self.kind = "tflite"
        elif suffix == ".ckpt":
            # native checkpoint: needs the architecture; stored alongside as json
            raise ValueError(
                ".ckpt artifacts carry only weights; load via YOLO(model_yaml) + "
                "utils.checkpoint.load_checkpoint, or export to stablehlo/tflite"
            )
        elif Path(self.path).is_dir() and (Path(self.path) / "saved_model.pb").exists():
            import tensorflow as tf

            sm = tf.saved_model.load(self.path)
            f = sm.signatures["serving_default"]

            def fn(x):
                out = f(images=np.asarray(x, np.float32) if not hasattr(x, "numpy") else x)
                if len(out) > 1:  # task-complete (seg/pose): named outputs
                    return {k: v.numpy() for k, v in out.items()}
                return list(out.values())[0].numpy()

            self._fn = fn
            self.kind = "saved_model"
        elif suffix == ".pb":
            # frozen TF GraphDef (reference autobackend.py's GraphDef row):
            # import the graph into a wrap_function and prune to the
            # (inputs, outputs) recorded by the exporter's sidecar — or, when
            # the sidecar is missing, the graph's placeholder and its sole
            # consumerless op, the standard TF1-graph recovery idiom.
            import json

            import tensorflow as tf

            gd = tf.compat.v1.GraphDef()
            gd.ParseFromString(Path(self.path).read_bytes())
            wrapped = tf.compat.v1.wrap_function(
                lambda: tf.compat.v1.import_graph_def(gd, name=""), []
            )
            sidecar = Path(self.path + ".json")
            if sidecar.exists():
                spec = json.loads(sidecar.read_text())
                in_names, out_names = spec["inputs"], spec["outputs"]
            else:
                in_names = [n.name + ":0" for n in gd.node if n.op == "Placeholder"][:1]
                consumed = {i.split(":")[0].lstrip("^") for n in gd.node for i in n.input}
                out_names = [
                    n.name + ":0" for n in gd.node
                    if n.name not in consumed and n.op not in ("NoOp", "Placeholder")
                ][-1:]
            ge = wrapped.graph.as_graph_element
            self._pb_fn = wrapped.prune([ge(n) for n in in_names], [ge(n) for n in out_names])

            def fn(x):
                return self._pb_fn(tf.constant(np.asarray(x, np.float32)))[0].numpy()

            self._fn = fn
            self.kind = "pb"
        elif suffix == ".onnx":
            # OpenCV-DNN runtime (reference autobackend.py's cv2.dnn row).
            # Round-4 artifacts carry the v10 decode in-graph (output
            # (B, max_det, 6)); raw_head artifacts still emit the pred map,
            # for which the NMS-free top-k decode runs host-side — the
            # reference's OpenCV-DNN client split (inference.cpp:30-41).
            import json

            import cv2

            self._net = cv2.dnn.readNetFromONNX(self.path)
            sidecar = Path(self.path + ".json")
            spec = json.loads(sidecar.read_text()) if sidecar.exists() else {}
            self._nc = spec.get("nc", 80)
            out_names = spec.get("outputs") or []
            from ..ops.postprocess import v10_detections

            def fn(x):
                self._net.setInput(np.transpose(np.asarray(x, np.float32), (0, 3, 1, 2)), "images")
                if len(out_names) > 1:  # task-complete (seg/pose) artifact
                    outs = self._net.forward(out_names)
                    return dict(zip(out_names, outs))
                pred = self._net.forward()
                if pred.shape[-1] == 6:  # decoded in-graph
                    return pred
                return np.asarray(v10_detections(jnp.asarray(pred), 300, self._nc))

            self._fn = fn
            self.kind = "onnx"
        elif suffix == ".torchscript":
            # LibTorch-format artifact (reference autobackend.py's torchscript
            # row): decoded in-graph (round 4) or raw pred map + host-side
            # decode, same client split as the ONNX row.
            import json

            import torch

            extra = {"config.txt": ""}
            self._mod = torch.jit.load(self.path, _extra_files=extra)
            self._mod.eval()
            try:
                meta = json.loads(extra["config.txt"])
            except ValueError:
                meta = {}
            self._nc = meta.get("nc", 80)
            out_names = meta.get("outputs") or []
            from ..ops.postprocess import v10_detections

            def fn(x):
                nchw = torch.from_numpy(np.transpose(np.asarray(x, np.float32), (0, 3, 1, 2)).copy())
                with torch.no_grad():
                    pred = self._mod(nchw)
                if isinstance(pred, (tuple, list)):  # task-complete (seg/pose)
                    names = out_names if len(out_names) == len(pred) else [
                        f"output_{i}" for i in range(len(pred))
                    ]
                    return {k: p.numpy() for k, p in zip(names, pred)}
                pred = pred.numpy()
                if pred.shape[-1] == 6:  # decoded in-graph
                    return pred
                return np.asarray(v10_detections(jnp.asarray(pred), 300, self._nc))

            self._fn = fn
            self.kind = "torchscript"
        elif suffix == ".pt":
            from ..engine.model import YOLO

            y = YOLO(self.path)
            jit_fn = jax.jit(
                lambda img: y.model.apply(y.variables, img, training=False, predict_only=True)["pred"]
            )
            from ..ops.postprocess import v10_detections

            self._fn = lambda x: np.asarray(v10_detections(jit_fn(jnp.asarray(x)), 300, y.model.nc))
            self.kind = "pt"
        else:
            raise ValueError(f"unsupported weights '{weights}' (suffix {suffix})")

    def forward(self, imgs: np.ndarray):
        """imgs: (B, H, W, 3) fp32 RGB in [0,1].

        Detect artifacts return one (B, max_det, 6) array; task-complete
        artifacts (seg/pose) return a dict of named arrays (pred/mc/proto or
        pred/kpt) — the reference's AutoBackend likewise passes through
        whatever the artifact emits (autobackend.py:421 forward).
        """
        out = self._fn(imgs)
        return out if isinstance(out, dict) else np.asarray(out)

    __call__ = forward

    def warmup(self, batch: int = 1) -> None:
        self.forward(np.zeros((batch, self.imgsz, self.imgsz, 3), np.float32))
