"""Shared calibration/analysis basis utilities.

Parity: reference ``presets/workflows/basis.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["label_ids_from_image"]


def label_ids_from_image(labels_img) -> list:
    """Sorted non-negative label ids from an image-like labels container."""
    arr = np.asarray(
        labels_img.img if hasattr(labels_img, "img") else labels_img
    )
    return sorted(int(label) for label in np.unique(arr) if label >= 0)
