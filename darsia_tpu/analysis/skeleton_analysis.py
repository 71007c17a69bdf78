"""Skeletonization + finger-path evolution analysis.

Parity: reference
``src/darsia/single_image_analysis/{skeleton,path_evolution}_analysis.py``
(skimage skeletonize replaced by our morphological skeleton).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils.morphology import skeletonize

__all__ = ["SkeletonAnalysis", "PathEvolutionAnalysis"]


class SkeletonAnalysis:
    """Skeletonize binary masks and measure skeleton properties."""

    def __init__(self, verbosity: bool = False) -> None:
        self.verbosity = verbosity
        self.skeleton: Optional[np.ndarray] = None
        self.img = None

    def load(self, img, roi: Optional[tuple] = None) -> None:
        self.img = img
        data = np.asarray(img.img if hasattr(img, "img") else img)
        if roi is not None:
            data = data[roi]
        self.skeleton = skeletonize(data.astype(bool))

    def skeleton_length(self) -> float:
        """Approximate physical length of the skeleton."""
        assert self.skeleton is not None, "Call load() first."
        # Count pixels, weight diagonal connections by sqrt(2)/... simple:
        n = int(self.skeleton.sum())
        if hasattr(self.img, "voxel_size"):
            return n * float(np.mean(self.img.voxel_size[:2]))
        return float(n)

    def endpoints(self) -> np.ndarray:
        """Skeleton endpoints (pixels with exactly one neighbour)."""
        assert self.skeleton is not None
        from scipy import ndimage

        neighbours = ndimage.convolve(
            self.skeleton.astype(np.int32),
            np.ones((3, 3), dtype=np.int32),
            mode="constant",
        )
        mask = self.skeleton & (neighbours == 2)  # self + 1 neighbour
        return np.argwhere(mask)

    def branch_points(self) -> np.ndarray:
        """Skeleton branch points (pixels with 3+ neighbours)."""
        assert self.skeleton is not None
        from scipy import ndimage

        neighbours = ndimage.convolve(
            self.skeleton.astype(np.int32),
            np.ones((3, 3), dtype=np.int32),
            mode="constant",
        )
        mask = self.skeleton & (neighbours >= 4)
        return np.argwhere(mask)


class PathEvolutionAnalysis:
    """Track finger-path evolution over a time series of masks."""

    def __init__(self, verbosity: bool = False) -> None:
        self.verbosity = verbosity
        self.history: list[dict] = []

    def add(self, img, time: Optional[float] = None) -> dict:
        """Analyze one time step: skeleton, tip positions, advance metrics."""
        analysis = SkeletonAnalysis()
        analysis.load(img)
        tips = analysis.endpoints()
        record = {
            "time": time,
            "skeleton_length": analysis.skeleton_length(),
            "num_fingers": len(tips),
            "tips": tips,
        }
        if self.history:
            prev = self.history[-1]
            record["length_growth"] = (
                record["skeleton_length"] - prev["skeleton_length"]
            )
        self.history.append(record)
        return record

    def tip_advance(self) -> np.ndarray:
        """Per-step maximal tip advance (rows) over the history."""
        advances = []
        for prev, curr in zip(self.history[:-1], self.history[1:]):
            if len(prev["tips"]) == 0 or len(curr["tips"]) == 0:
                advances.append(0.0)
                continue
            advances.append(
                float(curr["tips"][:, 0].max() - prev["tips"][:, 0].max())
            )
        return np.array(advances)
