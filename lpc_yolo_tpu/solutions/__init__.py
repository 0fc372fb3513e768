"""Demo solutions built on the Results/tracking APIs.

Behavioral spec: reference ultralytics/solutions/ — object counting
(object_counter.py), heatmaps (heatmap.py), speed estimation
(speed_estimation.py), distance calculation. Host-side numpy consumers of the
predict/track streams.
"""

from .ai_gym import AIGym
from .distance_calculation import DistanceCalculation
from .heatmap import Heatmap
from .object_counter import ObjectCounter
from .sliced_inference import sliced_predict, slice_grid
from .speed_estimator import SpeedEstimator

__all__ = ["AIGym", "DistanceCalculation", "Heatmap", "ObjectCounter", "SpeedEstimator", "sliced_predict", "slice_grid"]
