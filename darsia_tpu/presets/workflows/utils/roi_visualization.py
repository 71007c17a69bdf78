"""ROI/active-region visualization helpers.

Parity: reference ``presets/workflows/utils/roi_visualization.py:25-140``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ....utils.standard_images import roi_to_mask

__all__ = [
    "ActiveRegionRenderData",
    "build_active_mask_from_rois",
    "render_active_region",
    "draw_active_region",
]


@dataclass(frozen=True)
class ActiveRegionRenderData:
    """Rendered active-region image plus extracted boundary contours
    (reference ``presets/workflows/utils/roi_visualization.py:17-22``)."""

    image: np.ndarray
    mask: np.ndarray
    contours: list = field(default_factory=list)


def _as_bool_mask(mask, shape) -> np.ndarray:
    arr = np.asarray(mask.img if hasattr(mask, "img") else mask, dtype=bool)
    assert arr.shape[:2] == tuple(shape[:2]), "Mask shape mismatch."
    return arr


def build_active_mask_from_rois(rois, reference_image) -> np.ndarray:
    """Union mask of ROI configs/arrays on the reference image grid."""
    entries = list(rois.values()) if isinstance(rois, dict) else list(rois)
    mask = roi_to_mask(
        [roi.roi if hasattr(roi, "roi") else roi for roi in entries],
        reference_image,
    )
    return np.asarray(mask.img, dtype=bool)


def render_active_region(
    image, active_mask=None, dim_factor: float = 0.35
) -> ActiveRegionRenderData:
    """Dim the inactive region and extract mask boundary contours."""
    data = np.asarray(image.img if hasattr(image, "img") else image, dtype=float)
    if data.ndim == 2:
        data = np.stack([data] * 3, axis=-1)
    if active_mask is None:
        active = np.ones(data.shape[:2], dtype=bool)
    else:
        active = _as_bool_mask(active_mask, data.shape)
    out = data.copy()
    out[~active] *= dim_factor
    contours: list = []
    if active.any() and not active.all():
        from ....analysis.contouranalysis import _find_contours

        # cv2 contours are (N, 1, 2) in (col, row); expose skimage-style
        # (N, 2) (row, col) arrays like the reference.
        contours = [
            np.asarray(c, dtype=float).reshape(-1, 2)[:, ::-1]
            for c in _find_contours(active)
        ]
    return ActiveRegionRenderData(
        image=np.clip(out, 0, 1), mask=active, contours=contours
    )


def draw_active_region(
    ax, image, active_mask=None, title: str = "", stroke_color: str = "y"
) -> ActiveRegionRenderData:
    """Draw the dimmed active-region rendering + boundary on an axis."""
    render_data = render_active_region(image, active_mask)
    ax.imshow(render_data.image)
    ax.contour(
        render_data.mask.astype(float),
        levels=[0.5],
        colors=[stroke_color],
        linewidths=1.5,
    )
    if title:
        ax.set_title(title)
    ax.set_axis_off()
    return render_data
