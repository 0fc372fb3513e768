"""Model export: StableHLO / TF SavedModel / TFLite (+int8) from the jitted
predict graph.

Behavioral spec: reference engine/exporter.py:93-900 (export_formats table,
NMS-free v10 trace with fixed max_det output (B, max_det, 6), INT8
calibration). TPU-native export path: jax.export (StableHLO bytes — the
portable XLA artifact) and jax2tf -> SavedModel -> TFLiteConverter; formats
whose toolchains aren't in this environment (ONNX/TensorRT/CoreML/NCNN/...)
raise with instructions rather than silently degrade.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

EXPORT_FORMATS = {
    "ckpt": "flax msgpack checkpoint (native)",
    "stablehlo": "StableHLO serialized module (jax.export)",
    "saved_model": "TensorFlow SavedModel (jax2tf)",
    "tflite": "TFLite flatbuffer (jax2tf + TFLiteConverter)",
    "tflite-int8": "TFLite int8 full-integer quantization",
    "onnx": "ONNX graph (built-in jaxpr->ONNX converter; in-graph v10 decode, raw_head=True opts out)",
    "torchscript": "TorchScript module (jaxpr->torch interpreter + jit.trace; in-graph v10 decode, raw_head=True opts out)",
    "pb": "TensorFlow GraphDef frozen graph (jax2tf + constant folding)",
}
UNSUPPORTED = {
    "engine": "TensorRT targets NVIDIA GPUs; use stablehlo/tflite for TPU-adjacent deploys",
    "coreml": "coremltools not available",
    "paddle": "paddle toolchain not available",
    "ncnn": "ncnn toolchain not available",
    "edgetpu": "edgetpu_compiler not available",
    "tfjs": "tensorflowjs not available",
}


def _task_outputs(model) -> list:
    """Output names the export artifact carries, by head type.

    Task-complete export (reference engine/exporter.py:241-243 traces whatever
    the head emits in export mode — a seg artifact carries mask coefficients +
    protos, head.py:104-128 Segment returns (x, mc, p); pose carries kpts):
      detect:   ["det"|"pred"]
      segment:  ["pred", "mc", "proto"]
      pose:     ["pred", "kpt"]
      obb:      ["pred"]   (angle rides as the pred map's last column)
      classify: ["probs"]
    """
    head = model.specs[-1].module if getattr(model, "specs", None) else ""
    return {
        "Segment": ["pred", "mc", "proto"],
        "Pose": ["pred", "kpt"],
        "Classify": ["probs"],
    }.get(head, ["pred"])


def _predict_fn(model, variables, max_det: int = 300) -> Callable:
    """The exported computation: fp32 NHWC [B,H,W,3] in [0,1] -> named outputs.

    Mirrors the reference's export trace (head.py:519-523: NMS-free fixed-size
    decode with Detect.export semantics; head.py:104-128 seg mc+proto). Returns
    a dict of named arrays — single-output detect artifacts flatten to one
    tensor at the format layer.
    """
    from ..ops.postprocess import v10_detections

    names = _task_outputs(model)
    head = model.specs[-1].module if getattr(model, "specs", None) else ""

    def fn(img):
        out = model.apply(variables, img, training=False, predict_only=True)
        if "det" in out:  # v10 head: fused NMS-free decode in-graph
            return out["det"]
        if head == "OBB":
            # rotated boxes need rotated NMS client-side: export the raw
            # (B, A, 4+nc+1) map, angle as the last column
            return out["pred"]
        if names == ["pred"]:
            return v10_detections(out["pred"], max_det, model.nc)
        if len(names) == 1:
            return out[names[0]]
        # task-complete artifact (seg/pose): dict of named outputs
        return {k: out[k] for k in names}

    return fn


def export_model(
    yolo,
    fmt: str = "tflite",
    imgsz: int = 640,
    batch: int = 1,
    out_dir: Optional[str] = None,
    int8_calibration: Optional[np.ndarray] = None,
    max_det: int = 300,
    raw_head: bool = False,
) -> str:
    """Export the facade's model; returns the artifact path.

    raw_head=True opts the ONNX/TorchScript artifacts out of the in-graph
    v10 decode and emits the raw (B, anchors, 4+nc) pred map instead (the
    pre-round-4 behavior; some clients prefer running their own NMS/top-k).
    """
    fmt = str(fmt).lower().replace("int8", "tflite-int8") if fmt == "int8" else str(fmt).lower()
    if fmt in UNSUPPORTED:
        raise NotImplementedError(f"export format '{fmt}': {UNSUPPORTED[fmt]}")
    if fmt not in EXPORT_FORMATS:
        raise ValueError(f"unknown export format '{fmt}'; choose from {list(EXPORT_FORMATS)}")

    out_dir = Path(out_dir or "runs/export")
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = Path(str(yolo.ckpt_path)).stem
    fn = _predict_fn(yolo.model, yolo.variables, max_det=max_det)
    in_shape = (batch, imgsz, imgsz, 3)

    if fmt == "ckpt":
        from ..utils.checkpoint import save_checkpoint

        path = out_dir / f"{stem}.ckpt"
        # embed the architecture so YOLO('x.ckpt') can rebuild without the YAML
        meta = {"imgsz": imgsz, "nc": yolo.model.nc, "task": getattr(yolo, "task", None),
                "model_yaml": getattr(yolo, "model_yaml", None),
                "names": getattr(yolo, "names", None)}
        save_checkpoint(path, yolo.variables, meta)
        return str(path)

    # ONNX / TorchScript share one graph choice. v10 models export the full
    # NMS-free decode in-graph, output (B, max_det, 6) — same artifact
    # semantics as the reference's export trace (reference nn/modules/
    # head.py:515-523 v10Detect export mode + engine/exporter.py:232-237);
    # non-v10 heads (one-to-many, need NMS) export the raw pred map like the
    # reference's v8 ONNX artifact. raw_head=True forces raw for v10 too.
    decode_in_graph = (
        fmt in ("onnx", "torchscript")
        and not raw_head
        and getattr(yolo.model, "specs", None)
        and yolo.model.specs[-1].module == "v10Detect"
    )

    if fmt in ("onnx", "torchscript"):
        from ..ops.postprocess import v10_detections

        model, variables = yolo.model, yolo.variables
        if model.dtype != jnp.float32:
            # TPU builds compute in bf16, but ONNX/TorchScript artifacts are
            # fp32 (the reference exports fp32 unless half=True, and neither
            # target runtime accelerates bf16 on CPU). Params are stored f32
            # regardless of compute dtype, so an f32-compute clone applies
            # the same variable tree unchanged.
            # clone() preserves every field (reg_max, deploy, quant, ...)
            # instead of reconstructing a subset
            model = model.clone(dtype=jnp.float32)

        task_outs = _task_outputs(model)

        def client_fn(img_nchw):
            out = model.apply(variables, img_nchw, training=False, input_layout="NCHW")
            if decode_in_graph:
                return v10_detections(out["pred"], max_det, model.nc)
            if task_outs == ["pred"]:
                return out["pred"]
            # task-complete trace: seg carries (pred, mc, proto), pose
            # (pred, kpt) — the reference traces whatever the head emits in
            # export mode (head.py:104-128 Segment returns (x, mc, p))
            return tuple(out[k] for k in task_outs)

        out_names = ["det"] if decode_in_graph else task_outs
        out_desc = (
            f"det (B, {max_det}, 6) = [x1,y1,x2,y2,score,label] (in-graph NMS-free decode)"
            if decode_in_graph
            else {
                "pred": "pred (B, anchors, 4+nc[+extras]) xyxy + sigmoid scores",
                "mc": "mask coefficients (B, anchors, nm)",
                "proto": "mask prototypes (B, Hp, Wp, nm) NHWC",
                "kpt": "decoded keypoints (B, anchors, nk*3) letterbox px",
                "probs": "softmax class probabilities (B, nc)",
            }
        )
        if isinstance(out_desc, dict):
            out_desc = {k: out_desc[k] for k in out_names}

    if fmt == "onnx":
        # Input is fp32 NCHW in [0,1] (ONNX convention).
        from .onnx_export import export_onnx

        path = out_dir / f"{stem}.onnx"
        export_onnx(
            client_fn,
            (jax.ShapeDtypeStruct((batch, 3, imgsz, imgsz), jnp.float32),),
            str(path),
            input_names=["images"],
            output_names=out_names,
            graph_name=stem,
        )
        (out_dir / f"{stem}.onnx.json").write_text(
            json.dumps(
                {
                    "input": [batch, 3, imgsz, imgsz],
                    "input_layout": "NCHW fp32 [0,1]",
                    "output": out_desc,
                    "outputs": out_names,
                    "nc": yolo.model.nc,
                }
            )
        )
        return str(path)

    if fmt == "torchscript":
        # Same graph semantics as the ONNX path (decoded for v10, raw
        # otherwise): input fp32 NCHW in [0,1]. Metadata rides
        # _extra_files['config.txt'] like the reference exporter
        # (engine/exporter.py:326-330) for LibTorch clients.
        from .torch_export import export_torchscript

        path = out_dir / f"{stem}.torchscript"
        export_torchscript(
            client_fn,
            (jax.ShapeDtypeStruct((batch, 3, imgsz, imgsz), jnp.float32),),
            str(path),
            metadata={
                "input": [batch, 3, imgsz, imgsz],
                "input_layout": "NCHW fp32 [0,1]",
                "output": out_desc,
                "outputs": out_names,
                "nc": yolo.model.nc,
                "names": getattr(yolo, "names", None),
            },
        )
        return str(path)

    # named output shapes (task-complete: seg adds mc/proto, pose adds kpt)
    _shapes = jax.eval_shape(fn, jax.ShapeDtypeStruct(in_shape, jnp.float32))
    if not isinstance(_shapes, dict):
        _shapes = {_task_outputs(yolo.model)[0]: _shapes}
    out_shapes = {k: list(v.shape) for k, v in _shapes.items()}

    if fmt == "stablehlo":
        from jax import export as jexport

        exp = jexport.export(jax.jit(fn))(jax.ShapeDtypeStruct(in_shape, jnp.float32))
        path = out_dir / f"{stem}.stablehlo"
        path.write_bytes(exp.serialize())
        (out_dir / f"{stem}.stablehlo.json").write_text(
            json.dumps({"input": list(in_shape), "outputs": out_shapes, "nc": yolo.model.nc})
        )
        return str(path)

    # TF-family formats
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=[tf.TensorSpec(in_shape, tf.float32, name="images")],
        autograph=False,
    )
    if fmt == "pb":
        # frozen GraphDef (the reference's 'pb' TF flavor, exporter.py:808):
        # variables are folded to constants so the artifact is one
        # self-contained protobuf, consumed by wrap_function in AutoBackend
        from tensorflow.python.framework.convert_to_constants import (
            convert_variables_to_constants_v2,
        )

        frozen = convert_variables_to_constants_v2(tf_fn.get_concrete_function())
        path = out_dir / f"{stem}.pb"
        tf.io.write_graph(frozen.graph.as_graph_def(), str(out_dir), path.name, as_text=False)
        (out_dir / f"{stem}.pb.json").write_text(
            json.dumps(
                {
                    "inputs": [t.name for t in frozen.inputs],
                    "outputs": [t.name for t in frozen.outputs],
                    "input_shape": list(in_shape),
                    "output_shapes": out_shapes,
                    "nc": yolo.model.nc,
                }
            )
        )
        return str(path)

    module = tf.Module()
    module.f = tf_fn
    sm_path = out_dir / f"{stem}_saved_model"
    tf.saved_model.save(module, str(sm_path), signatures={"serving_default": tf_fn})
    # io_spec sidecar: graph tensor names for native (TF C API) clients
    try:
        from tensorflow.python.tools import saved_model_utils

        sig = saved_model_utils.get_meta_graph_def(str(sm_path), "serve").signature_def["serving_default"]
        spec = {
            "inputs": {k: v.name for k, v in sig.inputs.items()},
            "outputs": {k: v.name for k, v in sig.outputs.items()},
            "input_shape": list(in_shape),
            "output_shapes": out_shapes,
            "nc": yolo.model.nc,
        }
        (sm_path / "io_spec.json").write_text(json.dumps(spec, indent=1))
    except Exception:  # noqa: BLE001 — sidecar is best-effort
        pass
    if fmt == "saved_model":
        return str(sm_path)

    converter = tf.lite.TFLiteConverter.from_saved_model(str(sm_path))
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    if fmt == "tflite-int8":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        calib = int8_calibration if int8_calibration is not None else np.random.rand(8, *in_shape[1:]).astype(np.float32)

        def rep_data():
            for row in calib:
                yield [row[None]]

        converter.representative_dataset = rep_data
    blob = converter.convert()
    path = out_dir / (f"{stem}_int8.tflite" if fmt == "tflite-int8" else f"{stem}.tflite")
    path.write_bytes(blob)
    # sidecar: named output shapes (TFLite mangles tensor names; AutoBackend
    # maps the interpreter's outputs back to pred/mc/proto/kpt by shape)
    (Path(str(path) + ".json")).write_text(
        json.dumps({"input_shape": list(in_shape), "output_shapes": out_shapes, "nc": yolo.model.nc})
    )
    return str(path)


def load_stablehlo(path: str):
    """Re-hydrate a serialized StableHLO module into a callable (deserialized
    jax.export artifact — the native-runtime consumption path)."""
    from jax import export as jexport

    exp = jexport.deserialize(Path(path).read_bytes())
    return exp.call
