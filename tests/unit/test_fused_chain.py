"""Fused correction chains: one warp per geometric run.

VERDICT r2 task 1 — the public API (``Image(transformations=[...])`` /
``Rig.read_image``) must collapse consecutive geometric corrections into a
single coordinate field + ONE warp (SURVEY §3.1), matching the sequential
per-correction application within interpolation tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import darsia_tpu as da
from darsia_tpu.corrections.fuse import (
    FusedCorrectionChain,
    apply_transformation_chain,
    is_dynamic_fusable,
    is_static_fusable,
)
from darsia_tpu.ops.warp import identity_grid, warp, warp_backend


def _smooth_image(h=48, w=64, c=3, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    base = np.stack(
        [np.sin(3 * np.pi * xx + k) * np.cos(2 * np.pi * yy) for k in range(c)],
        axis=-1,
    )
    return (0.5 + 0.4 * base + 0.02 * rng.random((h, w, c))).astype(np.float32)


def _curvature(h, w):
    return da.CurvatureCorrection(
        config={
            "crop": {
                "pts_src": [[2, 3], [h - 3, 2], [h - 2, w - 4], [3, w - 2]],
                "width": 1.0,
                "height": 1.0,
            },
            "bulge": {"horizontal_bulge": 1e-6, "vertical_bulge": 2e-6},
        }
    )


class _Scale(da.BaseCorrection):
    """Minimal non-geometric correction (breaks fused runs)."""

    def __init__(self, factor: float = 0.5) -> None:
        self.factor = factor

    def correct_array(self, img):
        return img * self.factor


def test_fusable_detection():
    curv = _curvature(48, 64)
    trans = da.TranslationCorrection([1.5, -2.0])
    drift = da.DriftCorrection(base=_smooth_image())
    color = _Scale()
    assert is_static_fusable(curv)
    assert is_static_fusable(trans)
    assert is_dynamic_fusable(drift)
    assert not is_static_fusable(color) and not is_dynamic_fusable(color)


def test_fused_translation_curvature_matches_sequential():
    img = _smooth_image()
    h, w = img.shape[:2]
    trans = da.TranslationCorrection([1.5, -2.0])
    curv = _curvature(h, w)

    seq = np.asarray(curv.correct_array(trans.correct_array(jnp.asarray(img))))
    fused = FusedCorrectionChain([trans, curv], (h, w))
    out = np.asarray(fused.correct_array(jnp.asarray(img)))

    assert out.shape == seq.shape
    # Interior: fused (one resample) vs sequential (two resamples) agree to
    # interpolation-error order on a smooth image.
    inner = (slice(4, -4), slice(4, -4))
    assert np.abs(out[inner] - seq[inner]).mean() < 2e-3
    assert np.abs(out[inner] - seq[inner]).max() < 0.03


def test_fused_drift_curvature_matches_sequential():
    base = _smooth_image(seed=1)
    h, w = base.shape[:2]
    # Source = shifted base: drift should estimate ~(2, 3) and re-align.
    img = np.roll(base, shift=(2, 3), axis=(0, 1))
    drift = da.DriftCorrection(
        base=base, config={"roi": (slice(4, 44), slice(4, 60))}
    )
    curv = _curvature(h, w)

    seq = np.asarray(curv.correct_array(drift.correct_array(jnp.asarray(img))))
    fused = FusedCorrectionChain([drift, curv], (h, w))
    out = np.asarray(fused.correct_array(jnp.asarray(img)))

    assert out.shape == seq.shape
    inner = (slice(6, -6), slice(6, -6))
    assert np.abs(out[inner] - seq[inner]).mean() < 2e-3


def test_image_constructor_fuses_and_matches_sequential():
    img = _smooth_image(seed=2)
    h, w = img.shape[:2]
    trans = da.TranslationCorrection([0.5, 1.0])
    curv = _curvature(h, w)

    fused_image = da.OpticalImage(
        img.copy(), transformations=[trans, curv], width=1.0, height=1.0
    )
    seq_image = da.OpticalImage(img.copy(), width=1.0, height=1.0)
    trans(seq_image, overwrite=True)
    curv(seq_image, overwrite=True)

    assert fused_image.shape == seq_image.shape
    # Metadata updates (crop dimensions) propagate identically.
    assert np.allclose(fused_image.dimensions, seq_image.dimensions)
    assert np.allclose(
        np.asarray(fused_image.origin), np.asarray(seq_image.origin)
    )
    a = np.asarray(fused_image.img)
    b = np.asarray(seq_image.img)
    inner = (slice(4, -4), slice(4, -4))
    assert np.abs(a[inner] - b[inner]).mean() < 2e-3


def test_nonfusable_breaks_group():
    """A color correction between geometric ones splits the fused run."""
    img = _smooth_image(seed=3)
    h, w = img.shape[:2]
    trans = da.TranslationCorrection([1.0, 0.0])
    balance = _Scale(0.5)
    curv = _curvature(h, w)

    image = da.OpticalImage(
        img.copy(),
        transformations=[trans, balance, curv],
        width=1.0,
        height=1.0,
    )
    seq = da.OpticalImage(img.copy(), width=1.0, height=1.0)
    for t in (trans, balance, curv):
        t(seq, overwrite=True)
    a, b = np.asarray(image.img), np.asarray(seq.img)
    assert a.shape == b.shape
    # No adjacent geometric pair -> exactly the sequential path (bitwise).
    assert np.allclose(a, b, atol=1e-6)


def test_fused_series_application():
    img = _smooth_image(seed=4)
    h, w = img.shape[:2]
    series = np.stack([img, np.roll(img, 1, axis=0)], axis=2)  # (h, w, t, c)
    trans = da.TranslationCorrection([1.0, -1.0])
    curv = _curvature(h, w)
    image = da.Image(
        series.copy(),
        transformations=[trans, curv],
        width=1.0,
        height=1.0,
        series=True,
        time=[0.0, 1.0],
    )
    # Per-slice fused application == constructing each slice separately.
    single = da.Image(
        img.copy(), transformations=[trans, curv], width=1.0, height=1.0
    )
    assert np.allclose(
        np.asarray(image.img)[:, :, 0], np.asarray(single.img), atol=1e-5
    )


def test_warp_backend_pallas_interpret_matches_xla():
    """Forced Pallas path (interpret mode on CPU) == XLA gather warp."""
    img = _smooth_image(seed=5)
    h, w = img.shape[:2]
    coords = identity_grid((h, w)) + jnp.stack(
        [
            1.3 * jnp.ones((h, w), jnp.float32),
            -2.1 * jnp.ones((h, w), jnp.float32),
        ]
    )
    ref = np.asarray(warp(jnp.asarray(img), coords, order=1))
    out = np.asarray(
        warp_backend(jnp.asarray(img), coords, order=1, max_disp=4, force="pallas")
    )
    assert np.abs(out - ref).max() < 1e-4


def test_apply_transformation_chain_skips_none():
    img = _smooth_image(seed=6)
    image = da.OpticalImage(img.copy(), width=1.0, height=1.0)
    apply_transformation_chain(image, [None, da.TranslationCorrection([0, 0])])
    assert np.allclose(np.asarray(image.img), img, atol=1e-5)
