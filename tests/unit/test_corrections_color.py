"""Color correction tests: balances, polynomial correction, checker,
illumination corrections."""

import numpy as np
import pytest

import darsia_tpu as da
from darsia_tpu.presets.workflows.config.corrections import (
    IlluminationCorrectionConfig,
)


def test_white_balance_closed_form():
    rng = np.random.default_rng(0)
    src = rng.random((10, 3))
    scale = np.array([1.2, 0.8, 1.05])
    dst = src * scale
    wb = da.WhiteBalance()
    wb.find_balance(src, dst)
    assert np.allclose(np.diag(wb.balance_scaling), scale, atol=1e-10)


def test_color_balance_exact():
    rng = np.random.default_rng(1)
    src = rng.random((20, 3))
    B = np.array([[0.9, 0.05, 0.0], [0.1, 1.1, 0.0], [0.0, 0.02, 0.97]])
    dst = src @ B
    cb = da.ColorBalance()
    cb.find_balance(src, dst)
    assert np.allclose(cb.balance_scaling, B, atol=1e-10)
    out = np.asarray(cb.apply_balance(src.astype(np.float32)))
    assert np.allclose(out, dst, atol=1e-5)


def test_affine_balance_exact():
    rng = np.random.default_rng(2)
    src = rng.random((20, 3))
    B = np.eye(3) * 1.1
    t = np.array([0.01, -0.02, 0.005])
    dst = src @ B + t
    ab = da.AffineBalance()
    ab.find_balance(src, dst)
    assert np.allclose(ab.balance_scaling, B, atol=1e-8)
    assert np.allclose(ab.balance_translation, t, atol=1e-8)


def test_adaptive_balance_composition():
    rng = np.random.default_rng(3)
    src = rng.random((20, 3))
    B = np.diag([1.3, 0.7, 1.0])
    dst = src @ B
    adaptive = da.AdaptiveBalance()
    adaptive.find_balance(src, dst, mode="diagonal")
    adaptive.find_balance(src, dst, mode="affine")
    out = np.asarray(adaptive.apply_balance(src.astype(np.float32)))
    assert np.allclose(out, dst, atol=1e-5)


def test_cheung2004_linear_recovery():
    from darsia_tpu.ops.polynomial_color import colour_correction

    rng = np.random.default_rng(4)
    swatches = rng.random((24, 3))
    M = np.array([[1.1, 0.0, 0.1], [0.0, 0.9, 0.0], [0.05, 0.0, 1.0]])
    observed = swatches @ M
    # Correct observed -> swatches.
    img = observed.reshape(4, 6, 3)
    corrected = np.asarray(colour_correction(img, observed, swatches))
    assert np.allclose(corrected.reshape(24, 3), swatches, atol=1e-4)


def test_colorchecker_reference_swatches():
    checker = da.ColorCheckerAfter2014()
    swatches = checker.swatches_rgb
    assert swatches.shape == (4, 6, 3)
    # sRGB-encoded swatches match the published X-Rite values:
    # white ~ (243,243,242)/255 ~ 0.95, black ~ (52,52,52)/255 ~ 0.20.
    np.testing.assert_allclose(swatches[3, 0], [243 / 255] * 3, atol=0.035)
    np.testing.assert_allclose(swatches[3, 5], [52 / 255] * 3, atol=0.02)
    # Brown "dark skin" first.
    assert swatches[0, 0, 0] > swatches[0, 0, 2]


def test_custom_colorchecker_extraction():
    # Synthesize a perfect checker image from the reference swatches.
    ref = da.ColorCheckerAfter2014().swatches_rgb
    img = np.kron(ref, np.ones((40, 40, 1))).astype(np.float32)
    custom = da.CustomColorChecker(image=img)
    assert np.allclose(custom.swatches_rgb, ref, atol=0.08)


def test_color_correction_identity_on_reference_checker():
    ref = da.ColorCheckerAfter2014().swatches_rgb
    checker_img = np.kron(ref, np.ones((20, 20, 1))).astype(np.float32)
    # Embed checker into a larger scene.
    scene = np.full((200, 240, 3), 0.4, dtype=np.float32)
    scene[10 : 10 + 80, 20 : 20 + 120] = checker_img
    roi = np.array([[10, 20], [90, 20], [90, 140], [10, 140]])
    correction = da.ColorCorrection(config={"roi": roi, "clip": True})
    out = np.asarray(correction.correct_array(scene))
    # A scene already matching the reference checker changes only mildly.
    assert np.abs(out - scene).mean() < 0.08


def test_illumination_correction_api():
    img = da.OpticalImage(
        np.full((50, 50, 3), 0.5, dtype=np.float32), space_dim=2, indexing="ij"
    )
    config = IlluminationCorrectionConfig(width=5, num_samples=5, seed=42)
    corr = da.IlluminationCorrection()
    mask = np.ones((50, 50), dtype=bool)
    samples = corr.select_random_samples(mask=mask, config=config)
    assert len(samples) == 5
    for s in samples:
        assert isinstance(s[0], slice) and isinstance(s[1], slice)

    corr.setup(
        base=img,
        sample_groups=[samples],
        outliers=0.0,
        colorspace="hsl-scalar",
        interpolation="quartic",
    )
    assert hasattr(corr, "local_scaling")
    assert corr.local_scaling[0].img.shape == (50, 50)
    # Uniform image -> scaling ≈ 1 everywhere.
    assert np.allclose(np.asarray(corr.local_scaling[0].img), 1.0, atol=0.05)
    out = np.asarray(corr.correct_array(np.asarray(img.img)))
    assert np.allclose(out, 0.5, atol=0.05)


def test_illumination_empty_mask():
    corr = da.IlluminationCorrection()
    config = IlluminationCorrectionConfig(width=5, num_samples=5, seed=42)
    assert corr.select_random_samples(np.zeros((50, 50), bool), config) == []


def test_dynamic_illumination_correction():
    rng = np.random.default_rng(5)
    base = rng.random((40, 40, 3)).astype(np.float32)
    corr = da.DynamicIlluminationCorrection()
    samples = [(slice(5, 15), slice(5, 15)), (slice(20, 30), slice(20, 30))]
    corr.setup(base, samples)
    darkened = base * 0.7
    out = np.asarray(corr.correct_array(darkened))
    # Should rescale towards the base brightness.
    assert np.abs(out.mean() - base.mean()) < 0.08


def test_relative_color_correction_constant_matrix():
    rng = np.random.default_rng(6)
    baseline = da.OpticalImage(
        rng.random((20, 30, 3)).astype(np.float32), width=3.0, height=2.0
    )
    M = np.array([[1.2, 0.0, 0.0], [0.0, 0.8, 0.1], [0.0, 0.0, 1.0]])
    corr = da.RelativeColorCorrection(
        baseline=baseline, config={"degree": 0}
    )
    # Calibration data: colors c should map to M @ c at several positions.
    coords = np.array([[0.5, 0.5], [1.5, 1.0], [2.5, 1.5], [1.0, 0.3]])
    colors = rng.random((4, 3))
    for i in range(4):
        corr.add_calibration_data(
            coords[i : i + 1], colors[i : i + 1], M @ colors[i]
        )
    corr.calibrate()
    corr.setup()
    img = rng.random((20, 30, 3)).astype(np.float32)
    out = np.asarray(corr.correct_array(img))
    expected = np.einsum("rc,ijc->ijr", M, img)
    assert np.allclose(out, expected, atol=1e-3)


def test_patchwise_illumination_correction():
    rng = np.random.default_rng(7)
    base = (rng.random((60, 80, 3)) * 0.5 + 0.25).astype(np.float32)
    corr = da.PatchwiseIlluminationCorrection(
        image=base, baseline_images=[base], nw=8, limit=12, show_images=False
    )
    out = np.asarray(corr.correct_array(base))
    # Correcting the baseline by itself yields roughly the global mean color.
    assert out.shape == base.shape
    assert np.isfinite(out).all()
