"""Cheung-2004 polynomial color correction as pure JAX.

Replaces ``colour.colour_correction(..., method="Cheung 2004")`` (reference
call site ``src/darsia/corrections/color/colorcorrection.py:339``) without
the colour-science dependency: polynomial term expansion of RGB + exact LS
fit of the correction matrix, applied as one matmul over all pixels (MXU).

Term sets follow Cheung et al. 2004, "A comparative study of the
characterisation of colour cameras by means of neural networks and
polynomial transforms" (public method description).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["cheung2004_terms", "fit_cheung2004", "apply_cheung2004", "colour_correction"]


def cheung2004_terms(rgb: jnp.ndarray, terms: int = 3) -> jnp.ndarray:
    """Polynomial expansion of RGB samples (trailing channel axis).

    Supported term counts: 3, 5, 7, 8, 10, 11.
    """
    R, G, B = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    one = jnp.ones_like(R)
    if terms == 3:
        cols = [R, G, B]
    elif terms == 5:
        cols = [R, G, B, R * G * B, one]
    elif terms == 7:
        cols = [R, G, B, R * G, R * B, G * B, one]
    elif terms == 8:
        cols = [R, G, B, R * G, R * B, G * B, R * G * B, one]
    elif terms == 10:
        cols = [R, G, B, R * G, R * B, G * B, R * R, G * G, B * B, one]
    elif terms == 11:
        cols = [R, G, B, R * G, R * B, G * B, R * R, G * G, B * B, R * G * B, one]
    else:
        raise ValueError(f"Unsupported number of terms {terms}.")
    return jnp.stack(cols, axis=-1)


def fit_cheung2004(
    swatches_src: np.ndarray, swatches_dst: np.ndarray, terms: int = 3
) -> np.ndarray:
    """Exact LS fit of the (terms, 3) correction matrix."""
    X = np.asarray(
        cheung2004_terms(jnp.asarray(swatches_src, dtype=jnp.float32), terms)
    ).reshape(-1, terms)
    Y = np.asarray(swatches_dst, dtype=np.float64).reshape(-1, 3)
    M, *_ = np.linalg.lstsq(X.astype(np.float64), Y, rcond=None)
    return M


def apply_cheung2004(
    img: jnp.ndarray, matrix: np.ndarray, terms: int = 3
) -> jnp.ndarray:
    """Apply a fitted polynomial correction to an RGB image (one matmul)."""
    X = cheung2004_terms(jnp.asarray(img, dtype=jnp.float32), terms)
    M = jnp.asarray(matrix, dtype=jnp.float32)
    # Narrow matmul (<= 11 wide): bandwidth-bound, fp32 accuracy is free.
    return jnp.matmul(X, M, precision="highest")


def colour_correction(
    img, swatches_src, swatches_dst, terms: int = 3
) -> jnp.ndarray:
    """Fit + apply in one call (mirrors colour.colour_correction)."""
    M = fit_cheung2004(swatches_src, swatches_dst, terms)
    return apply_cheung2004(img, M, terms)
