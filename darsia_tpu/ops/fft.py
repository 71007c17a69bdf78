"""FFT phase correlation — batched, jittable translation estimation.

TPU-native replacement for the reference's ORB-feature + RANSAC translation
estimator (``src/darsia/corrections/shape/translation.py:36-373``,
``src/darsia/utils/features.py``): phase correlation gives the same
rigid-translation estimate deterministically, with no data-dependent control
flow, and batches over image patches with ``vmap`` — ideal for the patch-wise
registration pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "phase_correlation",
    "prepare_phase_reference",
    "phase_correlation_prepared",
    "masked_normalized_cross_correlation",
]


def _parabolic_subpixel(r: jnp.ndarray, peak: jnp.ndarray) -> jnp.ndarray:
    """1-dof parabolic refinement of an argmax location along each axis."""
    H, W = r.shape
    py, px = peak[0], peak[1]

    def fit(center, minus, plus):
        denom = minus - 2.0 * center + plus
        offset = jnp.where(
            jnp.abs(denom) > 1e-12, 0.5 * (minus - plus) / denom, 0.0
        )
        return jnp.clip(offset, -0.5, 0.5)

    c = r[py, px]
    dy = fit(c, r[(py - 1) % H, px], r[(py + 1) % H, px])
    dx = fit(c, r[py, (px - 1) % W], r[py, (px + 1) % W])
    return jnp.array([py + dy, px + dx])


def phase_correlation(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    eps: float = 1e-8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate the translation aligning ``src`` to ``dst``.

    If ``dst(x) ≈ src(x - d)``, returns ``d`` (in (row, col) order, subpixel)
    and the normalized peak response (quality in [0, 1]).

    Both inputs must be 2d arrays of equal shape (window the caller's data).
    """
    a = src.astype(jnp.float32)
    b = dst.astype(jnp.float32)
    # Remove mean and taper edges (Hann) to suppress spectral leakage.
    H, W = a.shape
    wy = jnp.hanning(H)[:, None] if H > 1 else jnp.ones((1, 1))
    wx = jnp.hanning(W)[None, :] if W > 1 else jnp.ones((1, 1))
    window = (wy * wx).astype(jnp.float32)
    a = (a - a.mean()) * window
    b = (b - b.mean()) * window

    Fa = jnp.fft.rfft2(a)
    Fb = jnp.fft.rfft2(b)
    cross = Fb * jnp.conj(Fa)
    cross = cross / (jnp.abs(cross) + eps)
    r = jnp.fft.irfft2(cross, s=(H, W))

    flat_peak = jnp.argmax(r)
    peak = jnp.array([flat_peak // W, flat_peak % W])
    refined = _parabolic_subpixel(r, peak)

    # Map wrap-around indices to signed shifts.
    shift = jnp.where(
        refined > jnp.array([H / 2, W / 2]),
        refined - jnp.array([H, W]),
        refined,
    )
    response = r.reshape(-1)[flat_peak] / (jnp.sum(jnp.abs(r)) / (H * W) + eps)
    # Normalize response to a [0,1]-ish quality score.
    quality = jnp.clip(r.reshape(-1)[flat_peak], 0.0, 1.0)
    del response
    return shift, quality


def prepare_phase_reference(src: jnp.ndarray) -> jnp.ndarray:
    """Precompute F(windowed reference) for repeated correlations against a
    fixed destination (e.g. baseline windows in a time series).

    ``phase_correlation_prepared(ref, img, shape)`` then matches
    ``phase_correlation(img, reference)`` exactly with one forward FFT.
    """
    a = src.astype(jnp.float32)
    H, W = a.shape
    wy = jnp.hanning(H)[:, None] if H > 1 else jnp.ones((1, 1))
    wx = jnp.hanning(W)[None, :] if W > 1 else jnp.ones((1, 1))
    window = (wy * wx).astype(jnp.float32)
    a = (a - a.mean()) * window
    return jnp.fft.rfft2(a)


def phase_correlation_prepared(
    ref_spectrum: jnp.ndarray,
    src: jnp.ndarray,
    shape: tuple,
    eps: float = 1e-8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``phase_correlation(src, reference)`` with F(reference) precomputed
    (one forward FFT per call instead of two)."""
    H, W = shape
    b = src.astype(jnp.float32)
    wy = jnp.hanning(H)[:, None] if H > 1 else jnp.ones((1, 1))
    wx = jnp.hanning(W)[None, :] if W > 1 else jnp.ones((1, 1))
    window = (wy * wx).astype(jnp.float32)
    b = (b - b.mean()) * window
    Fb = jnp.fft.rfft2(b)
    cross = ref_spectrum * jnp.conj(Fb)
    cross = cross / (jnp.abs(cross) + eps)
    r = jnp.fft.irfft2(cross, s=(H, W))
    flat_peak = jnp.argmax(r)
    peak = jnp.array([flat_peak // W, flat_peak % W])
    refined = _parabolic_subpixel(r, peak)
    shift = jnp.where(
        refined > jnp.array([H / 2, W / 2]),
        refined - jnp.array([H, W]),
        refined,
    )
    quality = jnp.clip(r.reshape(-1)[flat_peak], 0.0, 1.0)
    return shift, quality


def masked_normalized_cross_correlation(
    src: jnp.ndarray, dst: jnp.ndarray
) -> jnp.ndarray:
    """Normalized cross-correlation score of two equally shaped patches."""
    a = src.astype(jnp.float32)
    b = dst.astype(jnp.float32)
    a = a - a.mean()
    b = b - b.mean()
    denom = jnp.sqrt(jnp.sum(a * a) * jnp.sum(b * b)) + 1e-12
    return jnp.sum(a * b) / denom
