"""Array arithmetic helpers (parity: reference ``utils/arithmetics.py:6``)."""

from __future__ import annotations

import numpy as np

__all__ = ["array_product"]


def array_product(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Broadcast-aware product of arrays differing by a trailing axis."""
    a, b = np.asarray(a), np.asarray(b)
    if a.ndim == b.ndim + 1 and a.shape[:-1] == b.shape:
        return a * b[..., np.newaxis]
    if a.ndim == b.ndim - 1 and a.shape == b.shape[:-1]:
        return a[..., np.newaxis] * b
    if a.shape == b.shape:
        return a * b
    raise ValueError("Shapes not compatible.")
