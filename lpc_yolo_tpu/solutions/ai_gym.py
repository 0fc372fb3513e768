"""Workout rep counting from pose keypoints (reference solutions/ai_gym.py):
joint-angle thresholding with an up/down state machine per track."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def joint_angle(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Angle at b (degrees) formed by points a-b-c."""
    ba, bc = a - b, c - b
    cosang = np.dot(ba, bc) / (np.linalg.norm(ba) * np.linalg.norm(bc) + 1e-9)
    return float(np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0))))


class AIGym:
    """Counts reps from pose Results. kpt_indices picks the (a, b, c) joints —
    e.g. (6, 8, 10) = right shoulder/elbow/wrist for pushups/pullups."""

    def __init__(self, kpt_indices: Tuple[int, int, int] = (6, 8, 10), up_angle: float = 145.0, down_angle: float = 90.0):
        self.kpts = kpt_indices
        self.up_angle = up_angle
        self.down_angle = down_angle
        self.count: Dict[int, int] = {}
        self.stage: Dict[int, str] = {}

    def update(self, result) -> Dict[int, int]:
        """Consume one pose frame (Results with .keypoints (N, K, 3))."""
        if result.keypoints is None:
            return self.count
        ids = (
            result.boxes.id.astype(int)
            if result.boxes is not None and result.boxes.id is not None
            else range(len(result.keypoints))
        )
        for tid, kp in zip(ids, result.keypoints):
            a, b, c = (kp[i, :2] for i in self.kpts)
            ang = joint_angle(np.asarray(a), np.asarray(b), np.asarray(c))
            stage = self.stage.get(tid, "up")
            if ang < self.down_angle and stage == "up":
                self.stage[tid] = "down"
            elif ang > self.up_angle and stage == "down":
                self.stage[tid] = "up"
                self.count[tid] = self.count.get(tid, 0) + 1
        return self.count
