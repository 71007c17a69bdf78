"""Standardized image constructors (ROI masks).

Parity: reference ``utils/standard_images.py:73-140`` (roi_to_mask;
zeros_like/ones_like/full_like live in image.arithmetics and
multiphase.mass_analysis).
"""

from __future__ import annotations

from typing import Literal, Union

import numpy as np

from ..image.arithmetics import zeros_like

__all__ = ["roi_to_mask"]


def _corner_voxels(roi, reference_image) -> tuple:
    """Bounding-box corner voxels (row/col slices) for one ROI spec."""
    arr = np.asarray(roi.roi if hasattr(roi, "roi") else roi, dtype=float)
    if arr.shape != (2, 2):
        raise ValueError("ROI must be a (2, 2) array of two corners.")
    # Heuristic: integer-valued large entries are voxels; else coordinates.
    if np.allclose(arr, np.round(arr)) and arr.max() > reference_image.dimensions[0]:
        voxels = np.round(arr).astype(int)
    else:
        voxels = np.asarray(reference_image.coordinatesystem.voxel(arr))
    lo = np.minimum(voxels[0], voxels[1])
    hi = np.maximum(voxels[0], voxels[1])
    return lo, hi


def roi_to_mask(roi, reference_image, mode: str = "voxels"):
    """Boolean mask image covering one or the union of several box ROIs."""
    rois = roi if isinstance(roi, list) else [roi]
    mask = zeros_like(reference_image, mode="voxels", dtype=bool)
    arr = np.asarray(mask.img).copy()
    shape = arr.shape[:2]
    for entry in rois:
        lo, hi = _corner_voxels(entry, reference_image)
        r0, r1 = np.clip([lo[0], hi[0]], 0, shape[0])
        c0, c1 = np.clip([lo[1], hi[1]], 0, shape[1])
        arr[r0:r1, c0:c1] = True
    mask.img = arr
    return mask


# Parity: reference utils/standard_images.py:14.
StandardDtype = Literal[np.uint8, np.uint16, np.float32, np.float64, np.bool_]
