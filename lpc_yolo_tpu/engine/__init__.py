"""Engine layer: Model facade, Predictor, Trainer, Validator, train step."""

from .model import YOLO
from .predictor import Predictor
from .results import Boxes, Results

__all__ = ["YOLO", "Predictor", "Boxes", "Results"]
