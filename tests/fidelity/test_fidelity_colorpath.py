"""Fidelity: color-path machinery vs the reference (heterogeneous-media
calibration engine, reference signals/color/color_path*.py — the largest
reference module family).
"""

import numpy as np
import pytest

import darsia_tpu as dt


def _path_colors():
    return [
        np.array([0.1, 0.1, 0.3]),
        np.array([0.3, 0.5, 0.4]),
        np.array([0.8, 0.7, 0.2]),
    ]


def _make_paths(ref):
    return (
        ref.ColorPath(colors=[c.copy() for c in _path_colors()]),
        dt.ColorPath(colors=[c.copy() for c in _path_colors()]),
    )


class TestColorPathFidelity:
    def test_parametrizations(self, ref):
        r_path, o_path = _make_paths(ref)
        assert np.allclose(r_path.relative_distances, o_path.relative_distances)
        assert np.allclose(
            r_path.equidistant_distances, o_path.equidistant_distances
        )
        assert r_path.num_segments == o_path.num_segments

    def test_sample_absolute_color_path(self, ref):
        r_path, o_path = _make_paths(ref)
        r_samples = np.asarray(r_path.sample_absolute_color_path(64))
        o_samples = np.asarray(o_path.sample_absolute_color_path(64))
        assert r_samples.shape == o_samples.shape
        assert np.allclose(r_samples, o_samples, atol=1e-10)

    @pytest.mark.parametrize("mode", ["relative", "equidistant"])
    def test_fit_parametrizes_identically(self, ref, mode):
        r_path, o_path = _make_paths(ref)
        rng = np.random.default_rng(41)
        colors = rng.random((12, 13, 3))
        r_fit = np.asarray(r_path.fit(colors.copy(), ref.ColorMode.ABSOLUTE, mode=mode))
        o_fit = np.asarray(o_path.fit(colors.copy(), dt.ColorMode.ABSOLUTE, mode=mode))
        assert r_fit.shape == o_fit.shape
        assert np.allclose(r_fit, o_fit, atol=1e-6)

    def test_fit_relative_colors(self, ref):
        r_path, o_path = _make_paths(ref)
        rng = np.random.default_rng(42)
        rel = rng.standard_normal((10, 10, 3)) * 0.3
        r_fit = np.asarray(r_path.fit(rel.copy(), ref.ColorMode.RELATIVE))
        o_fit = np.asarray(o_path.fit(rel.copy(), dt.ColorMode.RELATIVE))
        assert np.allclose(r_fit, o_fit, atol=1e-6)

    def test_interpret_roundtrip(self, ref):
        """fit -> interpret reconstructs on-path colors in both builds."""
        r_path, o_path = _make_paths(ref)
        params = np.linspace(0.0, 1.0, 20)
        r_colors = np.asarray(r_path.interpret(params.copy(), ref.ColorMode.ABSOLUTE))
        o_colors = np.asarray(o_path.interpret(params.copy(), dt.ColorMode.ABSOLUTE))
        assert np.allclose(r_colors, o_colors, atol=1e-10)
        # Round trip through fit.
        r_back = np.asarray(r_path.fit(r_colors, ref.ColorMode.ABSOLUTE))
        o_back = np.asarray(o_path.fit(o_colors, dt.ColorMode.ABSOLUTE))
        assert np.allclose(r_back, params, atol=1e-6)
        assert np.allclose(o_back, params, atol=1e-6)

    @pytest.mark.parametrize("mode", ["relative", "equidistant"])
    def test_refine(self, ref, mode):
        r_path, o_path = _make_paths(ref)
        r_ref = r_path.refine(8, mode=mode)
        o_ref = o_path.refine(8, mode=mode)
        assert r_ref.num_segments == o_ref.num_segments
        assert np.allclose(
            np.asarray(r_ref.colors), np.asarray(o_ref.colors), atol=1e-10
        )

    def test_save_load_roundtrip(self, ref, tmp_path):
        r_path, o_path = _make_paths(ref)
        r_file = tmp_path / "ref_path.json"
        o_file = tmp_path / "our_path.json"
        r_path.save(r_file)
        o_path.save(o_file)
        # Cross-load: our loader must read the reference's file.
        cross = dt.ColorPath.load(r_file)
        assert np.allclose(
            np.asarray(cross.colors), np.asarray(r_path.colors), atol=1e-12
        )
        own = dt.ColorPath.load(o_file)
        assert np.allclose(
            np.asarray(own.colors), np.asarray(o_path.colors), atol=1e-12
        )


class TestColorPathModelsFidelity:
    def test_color_path_interpolation_model(self, ref):
        r_path, o_path = _make_paths(ref)
        values = [0.0, 0.4, 1.0]
        r_model = ref.ColorPathInterpolation(
            r_path, ref.ColorMode.ABSOLUTE, values=list(values)
        )
        o_model = dt.ColorPathInterpolation(
            o_path, dt.ColorMode.ABSOLUTE, values=list(values)
        )
        rng = np.random.default_rng(44)
        signal = rng.random((8, 9, 3))
        r_out = np.asarray(r_model(signal.copy()))
        o_out = np.asarray(o_model(signal.copy()))
        assert r_out.shape == o_out.shape
        assert np.allclose(r_out, o_out, atol=1e-5)


class TestLabelColorPathMapFidelity:
    def test_map_interpretation(self, ref):
        labels_arr = np.zeros((12, 12), dtype=int)
        labels_arr[:, 6:] = 1
        paths_r = {
            0: ref.ColorPath(colors=[c.copy() for c in _path_colors()]),
            1: ref.ColorPath(
                colors=[np.array([0.0, 0.0, 0.0]), np.array([1.0, 0.5, 0.2])]
            ),
        }
        paths_o = {
            0: dt.ColorPath(colors=[c.copy() for c in _path_colors()]),
            1: dt.ColorPath(
                colors=[np.array([0.0, 0.0, 0.0]), np.array([1.0, 0.5, 0.2])]
            ),
        }
        r_map = ref.LabelColorPathMap(paths_r)
        o_map = dt.LabelColorPathMap(paths_o)
        # Both expose per-label access used by the heterogeneous analysis.
        assert set(getattr(r_map, "color_paths", paths_r)) == set(
            getattr(o_map, "color_paths", paths_o)
        )


class TestLabelColorPathMapRegressionFidelity:
    """End-to-end heterogeneous calibration engine (reference
    signals/color/color_path_regression.py, its largest module): synthetic
    two-label plume series -> per-label color spectra -> regressed color
    paths. Both builds must find the same (resolution-quantized) paths."""

    N = 40
    BASE_COLORS = {0: np.array([0.2, 0.3, 0.5]), 1: np.array([0.5, 0.2, 0.2])}
    DIRS = {0: np.array([0.5, 0.3, -0.2]), 1: np.array([0.2, 0.5, 0.3])}

    def _build_map(self, mod, is_ref):
        n = self.N
        labels = np.zeros((n, n), dtype=int)
        labels[:, n // 2 :] = 1
        meta = dict(width=1.0, height=1.0)
        labels_img = mod.Image(labels.copy(), scalar=True, **meta)
        mask_img = mod.Image(np.ones((n, n), dtype=bool), scalar=True, **meta)
        baseline_arr = np.zeros((n, n, 3))
        for lab, c in self.BASE_COLORS.items():
            baseline_arr[labels == lab] = c
        rng = np.random.default_rng(7)
        images = []
        for t in (0.3, 0.6, 1.0):
            arr = baseline_arr.copy()
            yy = np.linspace(0, 1, n)[:, None] * np.ones((1, n))
            conc = np.clip(t - yy, 0, 1)
            for lab in (0, 1):
                m = labels == lab
                arr[m] += conc[m][:, None] * self.DIRS[lab][None]
            arr += 0.01 * rng.standard_normal(arr.shape)
            images.append(mod.Image(np.clip(arr, 0, 1), **meta))
        baseline = mod.Image(baseline_arr.copy(), **meta)
        # Both builds accept the same constructor now (the repo's
        # ColorRange gained color_mode in the method-parity sweep).
        cr = mod.ColorRange(
            min_color=-np.ones(3),
            max_color=np.ones(3),
            color_mode=mod.ColorMode.RELATIVE,
        )
        reg = mod.LabelColorPathMapRegression(
            labels_img, cr, resolution=9, mask=mask_img
        )
        spectra = reg.get_color_spectrum(images, baseline=baseline)
        return reg.find_color_path(spectra, num_segments=2)

    def _paths(self, pathmap):
        return pathmap.color_paths if hasattr(pathmap, "color_paths") else pathmap

    def test_regressed_paths_match(self, ref):
        r_paths = self._paths(self._build_map(ref, True))
        o_paths = self._paths(self._build_map(dt, False))
        assert set(r_paths) == set(o_paths) == {0, 1}
        for lab in (0, 1):
            r_rel = np.asarray(r_paths[lab].relative_colors)
            o_rel = np.asarray(o_paths[lab].relative_colors)
            assert r_rel.shape == o_rel.shape
            assert np.allclose(r_rel, o_rel, atol=1e-10), (lab, r_rel, o_rel)
            # And the regressed direction tracks the synthetic color
            # direction (within grid quantization, spacing 0.25).
            end = o_rel[-1] / max(np.linalg.norm(o_rel[-1]), 1e-12)
            true_dir = self.DIRS[lab] / np.linalg.norm(self.DIRS[lab])
            assert float(end @ true_dir) > 0.95
