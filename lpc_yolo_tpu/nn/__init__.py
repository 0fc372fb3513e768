"""Model graph layer: NHWC linen block zoo, heads, and the YAML->graph compiler."""

from .compiler import DetectionModel, LayerSpec, build_model, parse_model, yaml_model_load
from .heads import Detect, V10Detect, decode_feats

__all__ = [
    "DetectionModel",
    "LayerSpec",
    "build_model",
    "parse_model",
    "yaml_model_load",
    "Detect",
    "V10Detect",
    "decode_feats",
]
