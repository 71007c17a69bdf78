"""Tests for contour/skeleton analysis, calibration mixins, and
segmentation comparison."""

import numpy as np
import pytest

import darsia_tpu as da


def _square_mask(size=40, lo=10, hi=30):
    mask = np.zeros((size, size), dtype=bool)
    mask[lo:hi, lo:hi] = True
    return mask


def test_contour_length_square():
    img = da.ScalarImage(
        _square_mask().astype(np.float32), width=1.0, height=1.0
    )
    length = da.contour_length(img)
    # 20x20-pixel square perimeter ~ 4*19 px * 1/40 m/px = 1.9 m.
    assert 1.5 < length < 2.3


def test_contour_analysis_peaks():
    mask = np.zeros((40, 60), dtype=bool)
    mask[20:, :] = True  # flat interface
    mask[10:20, 14:17] = True  # finger 1
    mask[5:20, 34:37] = True  # finger 2 (higher)
    analysis = da.ContourAnalysis()
    analysis.load_labels(mask)
    assert analysis.length() > 0
    peaks, valleys = analysis.local_extrema()
    # At least the two finger tips show up as peaks.
    assert len(peaks) >= 2


def test_contour_smoothers():
    theta = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    rng = np.random.default_rng(0)
    r = 20 + rng.normal(0, 1.0, 100)
    xy = np.stack(
        [50 + r * np.cos(theta), 50 + r * np.sin(theta)], axis=1
    )
    contour = xy.reshape(-1, 1, 2).astype(np.int32)
    for smoother in [
        da.MovingAverageSmoother(window=9),
        da.GaussianSmoother(window_length=11),
        da.SavitzkyGolaySmoother(window_length=11, polyorder=3),
    ]:
        smoothed = smoother(contour)
        sm_xy = smoothed.reshape(-1, 2)
        radii = np.linalg.norm(sm_xy - [50, 50], axis=1)
        assert radii.std() < r.std()
    simplified = da.PolyDPSmoother(epsilon=3.0)(contour)
    assert len(simplified) < len(contour)


def test_skeleton_analysis():
    mask = np.zeros((30, 30), dtype=bool)
    mask[14:17, 2:28] = True  # horizontal bar
    analysis = da.SkeletonAnalysis()
    analysis.load(mask)
    assert analysis.skeleton_mask.sum() > 10
    assert len(analysis.endpoints()) >= 2
    # Reference-style contour-driven skeleton method.
    skeleton = analysis.skeleton()
    assert skeleton is not None and skeleton.sum() > 5


def test_path_evolution_masks():
    evolution = da.PathEvolutionAnalysis()
    for t, extent in enumerate([10, 15, 20]):
        mask = np.zeros((30, 30), dtype=bool)
        mask[14:17, 2:extent] = True
        evolution.add_mask(mask, time=float(t))
    assert len(evolution.history) == 3
    assert evolution.history[-1]["skeleton_length"] >= evolution.history[0][
        "skeleton_length"
    ]


def test_path_evolution_identity_tracking():
    """Two advancing fingers keep their identity; a third appears later
    (reference path_evolution_analysis.py:143-305 semantics)."""
    evolution = da.PathEvolutionAnalysis()
    # Times 0..2: finger A advances down col 5, finger B down col 20.
    evolution.add(np.array([[10, 5], [10, 20]]), time=0.0)
    evolution.add(np.array([[14, 5], [13, 20]]), time=1.0)
    # Time 2: a new finger C appears between them.
    evolution.add(np.array([[18, 5], [15, 12], [16, 20]]), time=2.0)
    evolution.find_paths()

    assert len(evolution.paths) == 3
    lengths = sorted(len(p) for p in evolution.paths)
    assert lengths == [1, 3, 3]
    # The two long paths advance monotonically in rows.
    for path in evolution.paths:
        if len(path) == 3:
            rows = [unit.position[0] for unit in path]
            assert rows == sorted(rows)

    counts = evolution.path_counts(2)
    assert counts["active"] == 3
    assert counts["new"] == 1
    assert counts["continuing"] == 2

    rates = evolution.advance_rates()
    assert len(rates) == 3
    long_rates = [r for r in rates if r["lifetime_steps"] == 3]
    assert all(r["advance_rate"] > 0 for r in long_rates)


def test_path_evolution_plot(tmp_path):
    evolution = da.PathEvolutionAnalysis()
    evolution.add(np.array([[5, 5]]), time=0.0)
    evolution.add(np.array([[8, 5]]), time=1.0)
    out = tmp_path / "paths.png"
    evolution.plot_paths(img=np.zeros((20, 20)), path=out)
    assert out.exists()


class _CalibrableAnalysis(
    da.ConcentrationAnalysis, da.InjectionRateModelObjectiveMixin
):
    pass


def test_injection_rate_calibration():
    # Synthetic: concentration = signal * scaling; images with growing blob.
    base = da.OpticalImage(
        np.zeros((20, 20, 3), dtype=np.float32), width=1.0, height=1.0
    )
    images = []
    for t in range(1, 4):
        arr = np.zeros((20, 20, 3), dtype=np.float32)
        arr[:, : 4 * t, 0] = 0.5  # growing region, signal 0.5
        img = da.OpticalImage(arr, width=1.0, height=1.0, time=float(t))
        images.append(img)

    analysis = _CalibrableAnalysis(
        base=base,
        signal_reduction=da.MonochromaticReduction(color="red"),
        model=da.ScalingModel(scaling=1.0),
        **{"restoration -> model": True},
    )
    geometry = da.Geometry(space_dim=2, num_voxels=(20, 20), dimensions=[1, 1])
    # True volumes: 0.5 * (4t/20) = 0.1 t -> injection rate 0.1 with scaling 1;
    # target rate 0.2 -> calibrated scaling 2.
    success = analysis.calibrate_model(
        images,
        options={
            "initial_guess": np.array([1.0]),
            "injection_rate": 0.2,
            "geometry": geometry,
            "regression_type": "linear",
            "method": "Nelder-Mead",
            "maxiter": 200,
            "dofs": ["scaling"],
        },
    )
    assert np.isclose(analysis.model._scaling, 2.0, rtol=1e-2)


def test_balancing_calibration_continuity():
    labels = np.zeros((20, 20), dtype=int)
    labels[:, 10:] = 1

    class _BalAnalysis(
        da.ConcentrationAnalysis, da.ContinuityBasedBalancingCalibrationMixin
    ):
        pass

    base = da.OpticalImage(
        np.zeros((20, 20, 3), dtype=np.float32), width=1.0, height=1.0
    )
    # Signal jumps by 2x across the boundary: balancing should equalize.
    arr = np.zeros((20, 20, 3), dtype=np.float32)
    arr[:, :10, 0] = 0.2
    arr[:, 10:, 0] = 0.4
    probe = da.OpticalImage(arr, width=1.0, height=1.0, time=1.0)

    analysis = _BalAnalysis(
        base=base,
        signal_reduction=da.MonochromaticReduction(color="red"),
        balancing=da.HeterogeneousLinearModel(labels, scaling=1.0, offset=0.0),
    )
    assert analysis.calibrate_balancing([probe], {"labels": labels})
    scalings = analysis.balancing._scaling
    # scaling_1 / scaling_0 ~ 0.5 to equalize the factor-2 jump.
    assert np.isclose(scalings[1] / scalings[0], 0.5, rtol=0.2)


def test_segmentation_comparison():
    a = _square_mask(40, 5, 25)
    b = _square_mask(40, 15, 35)
    comparison = da.SegmentationComparison(2)
    rgb = comparison(a, b)
    assert rgb.shape == (40, 40, 3)
    fractions = comparison.color_fractions(rgb)
    assert np.isclose(sum(fractions.values()), 1.0, atol=1e-6)
    # Overlap region exists.
    assert fractions[(0, 1)] > 0
    assert 0 < comparison.overlap(a, b) < 1


def test_extract_lower_arc():
    """Lower-arc extraction keeps the bottom of a closed contour
    (reference analysis_fingers.py:42-108 interface semantics)."""
    import cv2

    mask = np.zeros((40, 60), dtype=np.uint8)
    cv2.circle(mask, (30, 20), 12, 1, -1)
    contours, _ = cv2.findContours(
        mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
    )
    arc = da.extract_lower_arc(contours[0])
    pts = np.asarray(arc).reshape(-1, 2)  # (col, row)
    full = np.asarray(contours[0]).reshape(-1, 2)
    # Spans the full horizontal extent...
    assert pts[:, 0].min() == full[:, 0].min()
    assert pts[:, 0].max() == full[:, 0].max()
    # ...but stays on the lower half (larger rows than the circle center).
    assert pts[:, 1].mean() > full[:, 1].mean()
    # Roughly half the points of the closed contour.
    assert len(pts) < 0.75 * len(full)


def test_leaves_and_junctions_classification():
    """Skeleton feature classification: finger tips below the top line,
    splits off it, base junctions on it (ref skeleton_analysis.py:132-292)."""
    # A "comb": horizontal top bar with two teeth hanging down, one forked.
    mask = np.zeros((40, 40), dtype=bool)
    mask[5, 5:35] = True          # top bar
    mask[5:30, 10] = True         # plain tooth
    mask[5:20, 25] = True         # forked tooth stem
    mask[20:30, 22] = True        # fork left (approx)
    mask[20:30, 28] = True        # fork right
    mask[19, 23:28] = True        # connect fork
    analysis = da.SkeletonAnalysis()
    analysis.load(mask)
    leaves, junctions, base = analysis.leaves_and_junctions(
        max_group_distance=3
    )
    # Tips of the teeth are leaves; bar ends count too (reference keeps
    # boundary fingers, skeleton_analysis.py:213 comment).
    assert len(leaves) >= 3
    assert (leaves[:, 0] > 10).sum() >= 3  # the three hanging tooth tips
    # The bar-tooth attachments are base junctions on the top line.
    assert len(base) >= 1
    assert (base[:, 0] <= 6).all()
    # All classified points lie on the skeleton's bounding box.
    for pts in (leaves, junctions, base):
        if len(pts):
            assert pts[:, 0].min() >= 0 and pts[:, 1].max() < 40
