"""Shape correction tests: quad crop, curvature, affine, rotation,
translation, drift — analytic references on synthetic arrays."""

import numpy as np
import pytest

import darsia_tpu as da


def test_homography_identity():
    pts = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    H = da.homography_from_points(pts, pts)
    assert np.allclose(H, np.eye(3), atol=1e-10)


def test_quadrilateral_axis_aligned_crop():
    rng = np.random.default_rng(0)
    img = rng.random((40, 60, 3)).astype(np.float32)
    # Axis-aligned quadrilateral == plain crop (TL, BL, BR, TR in (row, col));
    # corner convention: dst voxel (h-1, w-1) samples the last src corner.
    pts = da.make_voxel([[10, 20], [29, 20], [29, 49], [10, 49]])
    out = np.asarray(
        da.extract_quadrilateral_ROI(img, pts_src=pts, shape=(20, 30))
    )
    ref = img[10:30, 20:50]
    assert np.allclose(out, ref, atol=1e-5)


def test_curvature_identity_config():
    rng = np.random.default_rng(1)
    img = rng.random((30, 40, 3)).astype(np.float32)
    corr = da.CurvatureCorrection(
        config={
            "bulge": {
                "horizontal_bulge": 0.0,
                "vertical_bulge": 0.0,
            }
        }
    )
    out = np.asarray(corr.correct_array(img))
    assert np.allclose(out, img, atol=1e-5)


def test_curvature_crop_metadata():
    rng = np.random.default_rng(2)
    img = rng.random((30, 40, 3)).astype(np.float32)
    corr = da.CurvatureCorrection(
        config={
            "crop": {
                "pts_src": [[0, 0], [29, 0], [29, 39], [0, 39]],
                "width": 2.0,
                "height": 1.0,
            }
        }
    )
    image = da.OpticalImage(img, transformations=[corr], width=4.0, height=3.0)
    assert np.allclose(image.dimensions, [1.0, 2.0])
    assert np.allclose(np.asarray(image.origin), [0.0, 1.0])


def test_affine_transformation_fit_similarity():
    rng = np.random.default_rng(3)
    src = rng.random((10, 2)) * 10
    angle = 0.3
    R = np.array(
        [[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]]
    )
    scale = 1.7
    t = np.array([2.0, -1.0])
    dst = t + scale * (R @ src.T).T

    trafo = da.AffineTransformation(dim=2)
    trafo.fit(da.make_coordinate(src), da.make_coordinate(dst))
    assert np.isclose(trafo.scaling, scale, atol=1e-8)
    assert np.allclose(trafo.rotation, R, atol=1e-8)
    assert np.allclose(trafo.translation, t, atol=1e-8)
    # Round trip.
    assert np.allclose(trafo.inverse_array(trafo.call_array(src)), src, atol=1e-8)


def test_affine_isometry_fit():
    src = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    dst = src + np.array([0.5, -0.25])
    trafo = da.AffineTransformation(dim=2)
    trafo.fit(
        da.make_coordinate(src),
        da.make_coordinate(dst),
        {"isometry": True},
    )
    assert np.isclose(trafo.scaling, 1.0)
    assert np.allclose(trafo.translation, [0.5, -0.25], atol=1e-10)


def test_translation_correction():
    img = np.zeros((20, 20), dtype=np.float32)
    img[5:10, 5:10] = 1.0
    corr = da.TranslationCorrection(translation=[3.0, 2.0])  # (dx, dy)
    out = np.asarray(corr.correct_array(img))
    expected = np.zeros_like(img)
    expected[7:12, 8:13] = 1.0
    assert np.allclose(out, expected, atol=1e-5)


def test_translation_estimator_phase_correlation():
    rng = np.random.default_rng(7)
    base = rng.random((64, 64)).astype(np.float32)
    # Shift by (5 rows, 3 cols): dst(x) = src(x - d).
    shifted = np.roll(base, shift=(5, 3), axis=(0, 1))
    est = da.TranslationEstimator()
    translation, intact = est.find_effective_translation(base, shifted)
    assert intact
    # Translation (dx, dy) aligning base -> shifted.
    assert np.allclose(translation, [3.0, 5.0], atol=0.25)


def test_drift_correction_aligns():
    rng = np.random.default_rng(8)
    base = rng.random((64, 64)).astype(np.float32)
    moved = np.roll(base, shift=(4, -6), axis=(0, 1))
    corr = da.DriftCorrection(base=base, config={"roi": (slice(0, 64), slice(0, 64))})
    out = np.asarray(corr.correct_array(moved))
    # Interior should match base after correction.
    assert np.allclose(out[8:-8, 8:-8], base[8:-8, 8:-8], atol=1e-2)


def test_rotation_correction_90deg():
    img = np.zeros((21, 21), dtype=np.float32)
    img[2:5, 8:13] = 1.0
    corr = da.RotationCorrection(anchor=[10, 10], rotations=[np.pi / 2])
    out = np.asarray(corr.correct_array(img))
    # Energy is preserved under rotation about the center (away from edges).
    assert np.isclose(out.sum(), img.sum(), rtol=0.2)
    # And the patch moved from the top band.
    assert out[2:5, 8:13].sum() < 0.5 * img[2:5, 8:13].sum()


def test_type_correction():
    img = (np.ones((4, 4)) * 255).astype(np.uint8)
    corr = da.TypeCorrection(np.float32)
    out = np.asarray(corr.correct_array(img))
    assert out.dtype == np.float32
    assert np.allclose(out, 1.0)


def test_correction_save_load_roundtrip(tmp_path):
    corr = da.TranslationCorrection(translation=[1.5, -2.0])
    corr.save(tmp_path / "t")
    loaded = da.read_correction(tmp_path / "t.npz")
    assert isinstance(loaded, da.TranslationCorrection)
    assert np.allclose(loaded.translation, [1.5, -2.0])


def test_series_batched_correction():
    rng = np.random.default_rng(9)
    arr = rng.random((16, 16, 3, 3)).astype(np.float32)  # space x time x rgb
    img = da.Image(arr, series=True, time=[0.0, 1.0, 2.0], dimensions=[1, 1])
    corr = da.TranslationCorrection(translation=[1.0, 0.0])
    out = corr(img)
    assert out.shape == arr.shape
    single = np.asarray(corr.correct_array(arr[:, :, 0]))
    assert np.allclose(np.asarray(out.img)[:, :, 0], single, atol=1e-6)
