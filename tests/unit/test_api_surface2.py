"""Behavior tests, second cluster: thresholding criteria, kernels,
protocols, flash variants, approximation spaces, color utilities,
assistants (headless)."""

from datetime import datetime, timedelta

import numpy as np
import pytest

import darsia_tpu as da


def _bimodal_signal():
    rng = np.random.default_rng(0)
    low = rng.normal(0.2, 0.03, (20, 20))
    high = rng.normal(0.8, 0.03, (20, 20))
    signal = low.copy()
    signal[:, 10:] = high[:, 10:]
    return np.clip(signal, 0, 1).astype(np.float32)


class TestThresholding:
    def test_otsu_separates_modes(self):
        signal = _bimodal_signal()
        threshold = da.StandardOtsu()(signal)
        assert 0.3 < float(threshold) < 0.7

    @pytest.mark.parametrize(
        "analysis_cls",
        ["OtsuTwoPeakHistogrammAnalysis", "GlobalMinTwoPeakHistogrammAnalysis"],
    )
    def test_two_peak_analyses(self, analysis_cls):
        signal = _bimodal_signal()
        analysis = getattr(da, analysis_cls)()
        threshold = analysis(signal)
        assert 0.3 < float(threshold) < 0.7

    def test_dynamic_threshold_model(self):
        signal = _bimodal_signal()
        model = da.DynamicThresholdModel(method="otsu")
        mask = np.asarray(model(signal))
        # Left half below, right half above the found threshold.
        assert mask[:, 12:].mean() > 0.9
        assert mask[:, :8].mean() < 0.1


class TestCriteria:
    def test_value_and_gradient_criteria(self):
        """BinaryDataSelector keeps connected mask regions satisfying the
        criterion (signal, candidate mask, unprocessed signal)."""
        signal = _bimodal_signal()
        # Two candidate regions: bright right half, dark left corner.
        mask = np.zeros_like(signal, dtype=bool)
        mask[:, 12:] = True
        mask[:5, :5] = True
        value_sel = da.BinaryDataSelector(
            criterion=da.ValueCriterion(threshold=0.6)
        )
        kept = np.asarray(value_sel(signal, mask, signal))
        assert kept[:, 12:].all()
        assert not kept[:5, :5].any()
        # RelativeValueCriterion: max > threshold * min (region contrast).
        contrast_sel = da.BinaryDataSelector(
            criterion=da.RelativeValueCriterion(threshold=10.0)
        )
        assert not np.asarray(
            contrast_sel(signal, mask, signal)
        ).any()  # both regions are uniform

    def test_transformed_and_combined(self):
        signal = _bimodal_signal()
        mask = np.zeros_like(signal, dtype=bool)
        mask[:, 12:] = True
        mask[:5, :5] = True
        tcrit = da.TransformedValueCriterion(
            transformation=lambda s: 1.0 - s, threshold=0.6
        )
        tmask = np.asarray(
            da.BinaryDataSelector(criterion=tcrit)(signal, mask, signal)
        )
        assert tmask[:5, :5].all()  # inverted selection keeps the dark region
        assert not tmask[:, 12:].any()

        combined = da.CombinedCriterion(
            [
                da.ValueCriterion(threshold=0.6),
                da.ValueCriterion(threshold=2.0),  # excludes all
            ]
        )
        cmask = np.asarray(
            da.BinaryDataSelector(criterion=combined)(signal, mask, signal)
        )
        assert cmask.mean() == 0.0


class TestKernels:
    def test_kernel_interpolation_variants(self):
        rng = np.random.default_rng(1)
        supports = rng.random((12, 3))
        values = supports @ np.array([1.0, -0.5, 2.0])
        for interp in (
            da.KernelInterpolation(
                da.GaussianKernel(gamma=5.0), supports, values
            ),
            da.AdvancedKernelInterpolation(da.GaussianKernel(gamma=5.0)),
        ):
            if isinstance(interp, da.AdvancedKernelInterpolation):
                interp.fix_supports(supports[:6], values[:6])
                interp.update(supports=supports[6:], values=values[6:])
            out = np.asarray(interp(supports.reshape(3, 4, 3)))
            np.testing.assert_allclose(
                out.ravel(), values, rtol=1e-2, atol=1e-2
            )

    def test_linear_kernel(self):
        k = da.LinearKernel(a=1.0)
        x = np.array([[0.0, 0.0], [1.0, 0.0]])
        val = np.asarray(k(x[0], x[1]))
        assert np.isfinite(val)


class TestProtocolsOld:
    def test_imaging_protocol_old_lookup(self, tmp_path):
        start = datetime(2026, 8, 1, 12, 0, 0)
        interval = da.ImagingInterval(
            start_id=100,
            end_id=110,
            start_datetime=start,
            dt_seconds=60.0,
        )
        protocol = da.ImagingProtocolOld(intervals=[interval])
        # Image 105 was taken 5 minutes after start.
        dt = protocol.get_datetime("DSC00105.jpg")
        assert dt == start + timedelta(minutes=5)

    def test_find_images_for_datetimes(self, tmp_path):
        start = datetime(2026, 8, 1, 12, 0, 0)
        interval = da.ImagingInterval(
            start_id=1, end_id=5, start_datetime=start, dt_seconds=3600.0
        )
        protocol = da.ImagingProtocolOld(intervals=[interval], pad=3)
        for i in range(1, 6):
            (tmp_path / f"{i:03d}.npz").write_bytes(b"")
        found = da.find_images_for_datetimes(
            tmp_path, protocol, [start + timedelta(hours=2)]
        )
        assert len(found) == 1
        assert found[0].name == "003.npz"


class TestFlashVariants:
    def test_advanced_flash_partition(self):
        flash = da.AdvancedFlash(s_g_max=0.8, s_g_cutoff=0.1)
        ramp = np.linspace(0, 1, 64).reshape(8, 8).astype(np.float32)
        c_g = da.ScalarImage(ramp, width=1.0, height=1.0)
        c_aq = da.ScalarImage(1.0 - ramp, width=1.0, height=1.0)
        chi_g, chi_aq, s_g, s_aq = flash(c_g, c_aq)
        sg = np.asarray(s_g.img)
        assert float(sg.max()) <= 0.8 + 1e-6
        assert float(sg.min()) >= 0.0
        # Saturations partition to <= 1.
        assert np.all(np.asarray(s_g.img) + np.asarray(s_aq.img) <= 1 + 1e-6)

    def test_thermodynamic_state(self):
        state = da.ThermodynamicState(pressure=1.01325, temperature=20.0)
        assert state.pressure == pytest.approx(1.01325)
        assert state.temperature == pytest.approx(20.0)


class TestApproximation:
    def test_linear_approximation_fits_polynomial(self):
        """LS fit over a 2d polynomial space recovers a bilinear field."""
        space = da.PolynomialApproximationSpace(degree=1)
        approx = da.LinearApproximation(space, dim=1, domain="coordinates")
        yy, xx = np.meshgrid(
            np.linspace(0, 1, 16), np.linspace(0, 1, 16), indexing="ij"
        )
        pts = np.stack([xx.ravel(), yy.ravel()], axis=1)
        field = 2.0 + 3.0 * pts[:, 0] - 1.5 * pts[:, 1]
        approx.fit(pts, field)
        evaluated = np.asarray(approx.evaluate(pts)).ravel()
        np.testing.assert_allclose(evaluated, field, atol=1e-8)


class TestColorUtils:
    def test_detect_color(self):
        img = np.zeros((10, 10, 3), np.float32)
        img[3, 4] = [1.0, 0.0, 0.0]
        voxels = da.detect_color(img, [1.0, 0.0, 0.0], tolerance=0.05)
        assert [3, 4] in np.asarray(voxels).tolist()

    def test_orthogonal_colors(self):
        basis = da.orthogonal_colors(np.array([1.0, 0.0, 0.0]))
        basis = np.atleast_2d(np.asarray(basis))
        for vec in basis:
            assert abs(float(vec @ np.array([1.0, 0.0, 0.0]))) < 1e-8

    def test_extract_characteristic_data(self):
        rng = np.random.default_rng(2)
        signal = np.concatenate(
            [
                rng.normal(0.2, 0.01, (50, 3)),
                rng.normal(0.8, 0.01, (50, 3)),
            ]
        ).reshape(10, 10, 3)
        colors = np.asarray(
            da.extract_characteristic_data(signal, num_clusters=2)
        )
        assert colors.reshape(-1, 3).shape[0] >= 1

    def test_hsv_spectrum(self):
        img = np.zeros((8, 8, 3), np.float32)
        img[..., 0] = 1.0  # pure red
        hist = da.hsv_spectrum(img, bins=36)
        assert hist is not None


class TestAssistantsHeadless:
    def test_monochromatic_assistant(self):
        img = da.OpticalImage(
            np.random.default_rng(3).random((8, 8, 3)).astype(np.float32),
            width=1.0, height=1.0,
        )
        assistant = da.MonochromaticAssistant(img, color="gray")
        out = assistant.to_scalar() if hasattr(assistant, "to_scalar") else None
        if out is not None:
            assert out.scalar

    def test_labels_merge_and_pick(self):
        labels = np.zeros((12, 12), int)
        labels[:, 6:] = 1
        labels[8:, :] += 2  # four regions
        img = da.Image(labels, width=1.0, height=1.0, scalar=True)
        merge = da.LabelsMergeAssistant(img)
        if hasattr(merge, "merge"):
            merged = merge.merge([0, 1])
            data = np.asarray(
                merged.img if hasattr(merged, "img") else merged
            )
            assert len(np.unique(data)) < 4
        pick = da.LabelsPickAssistant(img)
        if hasattr(pick, "pick"):
            picked = pick.pick(points=[[2, 2]])
            assert picked is not None
