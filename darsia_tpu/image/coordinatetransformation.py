"""Map one image onto another image's coordinate system.

Parity: reference ``src/darsia/image/coordinatetransformation.py:26-229``:
affine alignment between two physical coordinate systems + restriction to
the intersection of the active domains.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from ..corrections.shape.affine import AffineCorrection
from ..utils.point import make_coordinate
from .image import Image

__all__ = ["CoordinateTransformation"]


class CoordinateTransformation:
    """Affine coordinate alignment between two images' systems."""

    def __init__(
        self,
        coordinatesystem_src,
        coordinatesystem_dst,
        pts_src,
        pts_dst,
        fit_options: dict = {},
    ) -> None:
        self.coordinatesystem_src = coordinatesystem_src
        self.coordinatesystem_dst = coordinatesystem_dst
        self.correction = AffineCorrection(
            coordinatesystem_src,
            coordinatesystem_dst,
            pts_src,
            pts_dst,
            fit_options,
        )

    def find_intersection(self) -> tuple:
        """Voxel ROI (in the dst system) of the domain intersection."""
        src = self.coordinatesystem_src
        dst = self.coordinatesystem_dst
        # Transform source corners into the dst system.
        corners_voxels = np.array(
            [
                [0, 0],
                [src.shape[0], 0],
                [src.shape[0], src.shape[1]],
                [0, src.shape[1]],
            ]
        )
        coords = np.asarray(src.coordinate(corners_voxels))
        mapped = self.correction.transformation(make_coordinate(coords))
        mapped = np.atleast_2d(np.asarray(mapped))

        xmin = max(dst.domain["xmin"], float(mapped[:, 0].min()))
        xmax = min(dst.domain["xmax"], float(mapped[:, 0].max()))
        ymin = max(dst.domain["ymin"], float(mapped[:, 1].min()))
        ymax = min(dst.domain["ymax"], float(mapped[:, 1].max()))
        if xmin >= xmax or ymin >= ymax:
            raise ValueError("Empty intersection of domains.")

        voxels = np.asarray(
            dst.voxel(np.array([[xmin, ymax], [xmax, ymin]]))
        )
        return (
            slice(max(voxels[0, 0], 0), min(voxels[1, 0], dst.shape[0])),
            slice(max(voxels[0, 1], 0), min(voxels[1, 1], dst.shape[1])),
        )

    def __call__(self, img: Image) -> Image:
        """Warp an image into the destination system, cropped to overlap."""
        warped = self.correction(img)
        roi = self.find_intersection()
        return warped.subregion(roi)
