"""Resampling/resize ops (replaces cv2.resize on the compute path).

Reference parity: ``src/darsia/restoration/resize.py:18-370`` wraps
cv2.resize with "conservative" (integral-preserving) options; here those are
pure XLA programs: ``jax.image.resize`` for interpolation, exact block
reductions for integer-factor area averaging, and a sum-preserving rescale.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["resize_array", "downsample_mean", "upsample_linear"]

_METHODS = {
    "inter_nearest": "nearest",
    "inter_linear": "linear",
    "inter_cubic": "cubic",
    "inter_area": "linear",  # antialiased linear approximates area averaging
    "nearest": "nearest",
    "linear": "linear",
    "cubic": "cubic",
    "area": "linear",
}


def downsample_mean(data: jnp.ndarray, factors: tuple[int, ...]) -> jnp.ndarray:
    """Exact block-mean downsampling by integer factors (spatial axes lead).

    Equivalent to cv2 INTER_AREA for integer factors, and the natural
    TPU-friendly reduction (reshape + mean; no gathers).
    """
    dim = len(factors)
    shape = data.shape
    new_spatial = tuple(shape[d] // factors[d] for d in range(dim))
    # Crop to divisible extent.
    slices = tuple(slice(0, new_spatial[d] * factors[d]) for d in range(dim))
    cropped = data[slices]
    # Interleave (n, f) pairs per axis then mean over the f axes.
    reshaped_shape: list[int] = []
    for d in range(dim):
        reshaped_shape.extend([new_spatial[d], factors[d]])
    reshaped_shape.extend(shape[dim:])
    reshaped = cropped.reshape(reshaped_shape)
    mean_axes = tuple(2 * d + 1 for d in range(dim))
    return reshaped.mean(axis=mean_axes)


def upsample_linear(data: jnp.ndarray, shape: tuple[int, ...]) -> jnp.ndarray:
    """Bilinear upsampling of the leading spatial axes."""
    out_shape = tuple(shape) + data.shape[len(shape) :]
    return jax.image.resize(data, out_shape, method="linear")


def resize_array(
    data: jnp.ndarray,
    shape: tuple[int, ...],
    interpolation: str = "inter_linear",
    conservative: bool = False,
    dim: Optional[int] = None,
) -> jnp.ndarray:
    """Resize the leading ``dim`` spatial axes of ``data`` to ``shape``.

    Args:
        data: input array, spatial axes leading.
        shape: target spatial shape.
        interpolation: cv2-style ("inter_area", "inter_linear", ...) or plain
            method name.
        conservative: if True, rescale values so the total sum (integral) is
            preserved — for extensive quantities.
        dim: number of spatial axes (default: ``len(shape)``).

    """
    dim = dim or len(shape)
    spatial = data.shape[:dim]
    target = tuple(shape)
    if spatial == target:
        out = data
    else:
        method = _METHODS.get(interpolation.lower(), interpolation.lower())
        integer_down = all(
            spatial[d] % target[d] == 0 and spatial[d] >= target[d]
            for d in range(dim)
        )
        work = data.astype(jnp.float32)
        if method == "linear" and integer_down:
            out = downsample_mean(
                work, tuple(spatial[d] // target[d] for d in range(dim))
            )
        else:
            out_shape = target + data.shape[dim:]
            antialias = all(target[d] <= spatial[d] for d in range(dim))
            out = jax.image.resize(
                work, out_shape, method=method, antialias=antialias
            )
    if conservative:
        num_in = 1.0
        num_out = 1.0
        for d in range(dim):
            num_in *= spatial[d]
            num_out *= target[d]
        out = out * (num_in / num_out)
    return out
