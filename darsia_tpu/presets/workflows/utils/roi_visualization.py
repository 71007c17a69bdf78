"""ROI/active-region visualization helpers.

Parity: reference ``presets/workflows/utils/roi_visualization.py:25-140``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ....utils.standard_images import roi_to_mask

__all__ = [
    "build_active_mask_from_rois",
    "render_active_region",
    "draw_active_region",
]


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


def render_active_region(image, active_mask, dim_factor: float = 0.35):
    """Image with the inactive region dimmed (returns an RGB array)."""
    data = np.asarray(image.img if hasattr(image, "img") else image, dtype=float)
    if data.ndim == 2:
        data = np.stack([data] * 3, axis=-1)
    active = _as_bool_mask(active_mask, data.shape)
    out = data.copy()
    out[~active] *= dim_factor
    return np.clip(out, 0, 1)


def draw_active_region(
    ax, image, active_mask, title: str = "", stroke_color: str = "y"
):
    """Draw the dimmed active-region rendering + boundary on an axis."""
    rendered = render_active_region(image, active_mask)
    ax.imshow(rendered)
    active = _as_bool_mask(active_mask, rendered.shape)
    ax.contour(
        active.astype(float), levels=[0.5], colors=[stroke_color], linewidths=1.5
    )
    if title:
        ax.set_title(title)
    ax.set_axis_off()
    return ax
