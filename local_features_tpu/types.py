"""Public result types, mirroring the reference API surface
(lib.rs:17-24, lib.rs:77-83, python/src/lib.rs)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Keypoint:
    x: float
    y: float
    size: float
    angle: float
    response: float


@dataclass
class FeaturesResult:
    """Detected keypoints + descriptors for one image.

    `dropped_blobs` / `dropped_features` report capacity overflow, never
    fatal — same contract as the reference (lib.rs:81-82,
    vulkan/mod.rs:497-504).
    """

    keypoints_array: np.ndarray  # [N, 5] float32: x, y, size, angle, response
    descriptors: np.ndarray      # [N, 128] float32, unit rows
    dropped_blobs: int = 0
    dropped_features: int = 0

    @property
    def keypoints(self) -> list[Keypoint]:
        return [Keypoint(*map(float, row)) for row in self.keypoints_array]

    @property
    def x(self) -> np.ndarray:
        return self.keypoints_array[:, 0]

    @property
    def y(self) -> np.ndarray:
        return self.keypoints_array[:, 1]

    @property
    def size(self) -> np.ndarray:
        return self.keypoints_array[:, 2]

    @property
    def angle(self) -> np.ndarray:
        return self.keypoints_array[:, 3]

    @property
    def response(self) -> np.ndarray:
        return self.keypoints_array[:, 4]

    def __len__(self) -> int:
        return self.keypoints_array.shape[0]
