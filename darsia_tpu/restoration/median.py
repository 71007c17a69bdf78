"""Median filtering (skimage-rank-free).

Parity: reference ``src/darsia/restoration/median.py:7-28``.  The rank
median over a disk footprint is computed on device: stack the footprint
shifts and take the median across them — a fused sort network under XLA, no
Cython rank filters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.morphology import disk

__all__ = ["Median", "median_filter"]


@functools.partial(jax.jit, static_argnames=("offsets",))
def _median_shifts(img: jnp.ndarray, offsets: tuple) -> jnp.ndarray:
    stacked = jnp.stack(
        [jnp.roll(img, shift=(dy, dx), axis=(0, 1)) for dy, dx in offsets]
    )
    return jnp.median(stacked, axis=0)


def median_filter(img, disk_radius: int = 1) -> jnp.ndarray:
    """Median filter over a disk footprint."""
    footprint = disk(disk_radius)
    offs = tuple(
        (int(dy) - disk_radius, int(dx) - disk_radius)
        for dy, dx in np.argwhere(footprint)
    )
    return _median_shifts(jnp.asarray(img), offs)


class Median:
    """Median filter restoration object."""

    def __init__(self, key: str = "", **kwargs) -> None:
        self.disk_radius: int = kwargs.get(key + "disk radius", 1)

    def __call__(self, img):
        if hasattr(img, "img"):
            out = img.copy()
            out.img = median_filter(jnp.asarray(img.img), self.disk_radius)
            return out
        return median_filter(jnp.asarray(img), self.disk_radius)
