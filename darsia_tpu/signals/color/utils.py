"""Color utilities (parity: reference ``signals/color/utils.py:8``)."""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["get_mean_color"]


def get_mean_color(
    image, mask: Optional[np.ndarray] = None, robust: bool = True
) -> np.ndarray:
    """Mean (or median, if robust) color over a masked region."""
    data = np.asarray(image.img if hasattr(image, "img") else image)
    flat = data.reshape(-1, data.shape[-1])
    if mask is not None:
        mask_arr = np.asarray(
            mask.img if hasattr(mask, "img") else mask, dtype=bool
        ).reshape(-1)
        flat = flat[mask_arr]
    if robust:
        return np.median(flat, axis=0)
    return flat.mean(axis=0)
