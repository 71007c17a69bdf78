"""Crop assistant: 4 corner points -> CurvatureCorrection crop config.

Parity: reference ``assistants/crop_assistant.py:15-168`` (interactive
4-point pick + automatic colored-mark detection).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from ..utils.detection import detect_closest_point, detect_color
from ..utils.point import VoxelArray, make_voxel
from .selection_assistants import PointSelectionAssistant

__all__ = ["CropAssistant"]


class CropAssistant(PointSelectionAssistant):
    """Build the 'crop' config for CurvatureCorrection."""

    def __init__(
        self,
        img,
        width: Optional[float] = None,
        height: Optional[float] = None,
        **kwargs,
    ) -> None:
        super().__init__(img, **kwargs)
        self.width = width
        self.height = height

    def __call__(self) -> dict:
        pts = super().__call__()
        assert len(pts) == 4, "Wrong number of points selected."
        self.pts = pts
        assert self.width is not None and self.height is not None, (
            "Provide width and height (interactive prompt not available "
            "headless)."
        )
        return self._define_config()

    def _define_config(self) -> dict:
        return {
            "crop": {
                "width": self.width,
                "height": self.height,
                "pts_src": np.asarray(self.pts),
            }
        }

    def from_image(
        self,
        color: Union[list, np.ndarray],
        width: Optional[float] = None,
        height: Optional[float] = None,
    ) -> dict:
        """Automatic mode: find colored marks near the image corners
        (reference crop_assistant.py:100-168)."""
        color = np.asarray(color, dtype=float)
        self.pts = self._find_marks(color)
        if self.width is None:
            assert width is not None, "Width not provided."
            self.width = width
        if self.height is None:
            assert height is not None, "Height not provided."
            self.height = height
        return self._define_config()

    def _find_marks(self, color) -> VoxelArray:
        marked = detect_color(self.img, color, tolerance=5e-2)
        shape = np.asarray(
            self.img.img if hasattr(self.img, "img") else self.img
        ).shape
        top_left = detect_closest_point(marked, make_voxel([0, 0]))
        top_right = detect_closest_point(marked, make_voxel([0, shape[1]]))
        bottom_left = detect_closest_point(marked, make_voxel([shape[0], 0]))
        bottom_right = detect_closest_point(
            marked, make_voxel([shape[0], shape[1]])
        )
        return make_voxel(
            np.asarray([top_left, bottom_left, bottom_right, top_right])
        )
