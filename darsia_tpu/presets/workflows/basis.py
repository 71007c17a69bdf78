"""Shared calibration/analysis basis utilities.

Parity: reference ``presets/workflows/basis.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["label_ids_from_image"]


def label_ids_from_image(labels_img) -> list:
    """Sorted non-negative label ids present in a labels container.

    Accepts either an :class:`~darsia_tpu.image.Image` or a bare array;
    negative ids mark masked-out voxels and are dropped.
    """
    arr = getattr(labels_img, "img", labels_img)
    ids = np.unique(np.asarray(arr))
    return [int(v) for v in ids if v >= 0]
