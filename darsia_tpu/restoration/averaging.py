"""REV volume averaging with porosity weighting.

Parity: reference ``src/darsia/restoration/averaging.py:15-186``.  The
uniform filter is an XLA reduce_window box mean (with edge-count
normalization), replacing scipy.ndimage.uniform_filter on the compute path.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

logger = logging.getLogger(__name__)

__all__ = ["REV", "VolumeAveraging", "volume_average", "uniform_filter"]


@functools.partial(jax.jit, static_argnames=("size",))
def uniform_filter(data: jnp.ndarray, size: int) -> jnp.ndarray:
    """Local box mean with proper edge normalization (2d)."""
    data = data.astype(jnp.float32)
    window = (size, size)
    summed = lax.reduce_window(
        data, 0.0, lax.add, window, (1, 1), "SAME"
    )
    counts = lax.reduce_window(
        jnp.ones_like(data), 0.0, lax.add, window, (1, 1), "SAME"
    )
    return summed / counts


class REV:
    """Representative elementary volume, sized in physical units."""

    def __init__(self, size, img) -> None:
        if isinstance(size, float):
            size = [size] * img.coordinatesystem.dim
        self.size: int = max(
            int(
                img.coordinatesystem.num_voxels(size[i], axis="xyz"[i])
            )
            for i in range(img.coordinatesystem.dim)
        )


class VolumeAveraging:
    """Porosity-weighted local averaging over an REV window."""

    def __init__(
        self,
        rev: REV,
        mask,
        labels=None,
        tol: float = 1e-12,
    ) -> None:
        self.rev_size = rev.size
        self.mask = mask
        self.labels = labels
        mask_arr = jnp.asarray(
            mask.img if hasattr(mask, "img") else mask, dtype=jnp.float32
        )
        self.mean_pore_volume = np.asarray(
            uniform_filter(mask_arr, self.rev_size)
        )
        self.zero_mask = self.mean_pore_volume < tol
        logger.info(
            "Number of zero indices in pore volume identification: %d",
            int(self.zero_mask.sum()),
        )

    def __call__(self, img):
        if hasattr(img, "img"):
            result = img.copy()
            result.img = self._average_array(jnp.asarray(img.img))
            return result
        return self._average_array(jnp.asarray(img))

    def _average_array(self, arr: jnp.ndarray) -> jnp.ndarray:
        if arr.ndim == 2:
            return self._average_single(arr)
        if arr.ndim == 3:
            return jnp.stack(
                [self._average_single(arr[..., i]) for i in range(arr.shape[-1])],
                axis=-1,
            )
        raise ValueError("Only 2D and 3D arrays are supported.")

    def _average_single(self, arr: jnp.ndarray) -> jnp.ndarray:
        mask_arr = jnp.asarray(
            self.mask.img if hasattr(self.mask, "img") else self.mask,
            dtype=jnp.float32,
        )
        masked = arr.astype(jnp.float32) * mask_arr
        mean_masked = uniform_filter(masked, self.rev_size)
        result = mean_masked / jnp.asarray(
            np.where(self.zero_mask, 1.0, self.mean_pore_volume)
        )
        return jnp.where(jnp.asarray(self.zero_mask), 0.0, result)


def volume_average(img, mask, size: float):
    """One-shot volume averaging."""
    return VolumeAveraging(rev=REV(size=size, img=img), mask=mask)(img)


def porosity_based_averaging(
    labels, porosity, ref_image, threshold: float = 0.3, disk_size: int = 5,
    rev_size: float = 0.005,
):
    """Porosity-weighted volume averaging with deactivated layer boundaries.

    Parity: reference ``restoration/averaging.py:165-203``.  Grains
    (porosity below ``threshold``) and label-boundary buffer zones are
    excluded from the averaging mask.
    """
    from ..utils.morphology import binary_dilation, disk

    labels_arr = np.asarray(labels.img if hasattr(labels, "img") else labels)
    porosity_arr = np.array(
        np.asarray(porosity.img if hasattr(porosity, "img") else porosity),
        dtype=float,
    )

    # Erode each label region: pixels within disk_size of another label are
    # excluded (layer boundaries).
    residual = np.zeros(labels_arr.shape, dtype=bool)
    footprint = disk(disk_size)
    for label in np.unique(labels_arr):
        mask = labels_arr == label
        dilated_negative = binary_dilation(~mask, footprint=footprint)
        residual |= mask & dilated_negative

    porosity_arr[porosity_arr < threshold] = 0.0
    porosity_arr[residual] = 0.0

    return VolumeAveraging(
        rev=REV(size=rev_size, img=ref_image), mask=porosity_arr
    )
