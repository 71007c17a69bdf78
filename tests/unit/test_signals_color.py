"""Tests for darsia_tpu.signals.color (paths, ranges, embeddings,
regression)."""

import numpy as np
import pytest

import darsia_tpu as da


def _image(data):
    return da.Image(np.asarray(data), width=1.0, height=1.0, color_space="RGB")


class TestColorPath:
    def test_fit_interpret_roundtrip(self):
        path = da.ColorPath(
            colors=[np.zeros(3), np.array([0.5, 0.0, 0.0]), np.ones(3)]
        )
        params = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
        colors = path.interpret(params, da.ColorMode.ABSOLUTE, mode="equidistant")
        recovered = path.fit(colors, da.ColorMode.ABSOLUTE, mode="equidistant")
        assert np.allclose(recovered, params, atol=1e-5)

    def test_fit_offpath_snaps_to_closest(self):
        path = da.ColorPath(colors=[np.zeros(3), np.array([1.0, 0.0, 0.0])])
        # A color off the path projects to its closest point.
        p = path.fit(
            np.array([[0.5, 0.3, -0.2]]), da.ColorMode.ABSOLUTE, mode="equidistant"
        )
        assert np.allclose(p, [0.5], atol=1e-5)

    def test_refine(self):
        path = da.ColorPath(colors=[np.zeros(3), np.ones(3)])
        refined = path.refine(4)
        assert refined.num_segments == 4
        assert np.allclose(refined.colors[2], 0.5 * np.ones(3), atol=1e-5)

    def test_save_load(self, tmp_path):
        path = da.ColorPath(
            colors=[np.zeros(3), np.array([0.1, 0.2, 0.3])], name="test"
        )
        path.save(tmp_path / "p.json")
        loaded = da.ColorPath.load(tmp_path / "p.json")
        assert loaded.name == "test"
        assert np.allclose(loaded.colors[1], [0.1, 0.2, 0.3])

    def test_define_color_path(self):
        rng = np.random.default_rng(0)
        t = rng.uniform(size=400)
        colors = np.stack([t, 0.5 * t, np.zeros_like(t)], axis=-1)
        img = _image(colors.reshape(20, 20, 3))
        mask = np.ones((20, 20), dtype=bool)
        path = da.define_color_path(img, mask, num_colors=4)
        # End-to-end direction is along (1, 0.5, 0).
        span = path.colors[-1] - path.colors[0]
        span = span / np.linalg.norm(span)
        assert abs(abs(span @ np.array([1, 0.5, 0]) / np.linalg.norm([1, 0.5, 0])) - 1) < 0.05


class TestColorRange:
    def test_box_membership(self):
        cr = da.ColorRange(np.zeros(3), 0.5 * np.ones(3))
        inside = cr.contains(np.array([[0.2, 0.2, 0.2], [0.7, 0.2, 0.2]]))
        assert inside.tolist() == [True, False]

    def test_discrete_range_fit_contains(self):
        rng = np.random.default_rng(1)
        colors = rng.uniform(0.4, 0.6, size=(200, 3))
        dcr = da.DiscreteColorRange(resolution=11).fit(colors)
        assert dcr.contains(colors).all()
        assert not dcr.contains(np.array([[0.0, 0.0, 0.0]])).any()

    def test_discrete_range_expand(self):
        dcr = da.DiscreteColorRange(resolution=11).fit(
            np.array([[0.5, 0.5, 0.5]])
        )
        before = len(dcr.occupancy)
        dcr.expand(iterations=1)
        assert len(dcr.occupancy) > before

    def test_negative_box_quantization(self):
        # Relative colors live in [-1, 1]; box-aware quantization must
        # round-trip through bin centers.
        colors = np.array([[-0.5, 0.0, 0.5]])
        idx = da.color_to_index(colors, 11, -np.ones(3), np.ones(3))
        centers = da.index_to_color(idx, 11, -np.ones(3), np.ones(3))
        assert np.allclose(centers, colors, atol=0.1)

    def test_spectrum_weight_and_serialization(self, tmp_path):
        rng = np.random.default_rng(2)
        colors = np.concatenate(
            [np.full((90, 3), 0.5), rng.uniform(0.0, 0.2, size=(10, 3))]
        )
        spec = da.ColorSpectrum(resolution=11).fit(colors)
        w_dense = spec.weight(np.array([0.5, 0.5, 0.5]))
        w_none = spec.weight(np.array([0.9, 0.9, 0.9]))
        assert w_dense > 0.5 and w_none == 0.0
        spec.save(tmp_path / "s.npz")
        loaded = da.ColorSpectrum.load(tmp_path / "s.npz")
        assert loaded.weight(np.array([0.5, 0.5, 0.5])) == pytest.approx(
            float(w_dense)
        )
        roundtrip = da.ColorSpectrum.from_dict(spec.to_dict())
        assert roundtrip.counts == spec.counts


class TestLabelMaps:
    def test_label_color_path_map_persistence(self, tmp_path):
        paths = da.LabelColorPathMap(
            {
                0: da.ColorPath(colors=[np.zeros(3), np.ones(3)]),
                3: da.ColorPath(colors=[np.zeros(3), np.array([1.0, 0, 0])]),
            }
        )
        paths.save(tmp_path / "paths")
        loaded = da.LabelColorPathMap.load(tmp_path / "paths")
        assert set(loaded.keys()) == {0, 3}
        assert np.allclose(loaded[3].colors[1], [1, 0, 0])

    def test_label_color_map_persistence(self, tmp_path):
        cmap = da.LabelColorMap({1: np.array([0.1, 0.2, 0.3])})
        cmap.save(tmp_path / "colors")
        loaded = da.LabelColorMap.load(tmp_path / "colors")
        assert np.allclose(loaded[1], [0.1, 0.2, 0.3])


class TestColorPathInterpolation:
    def test_maps_path_colors_to_values(self):
        path = da.ColorPath(colors=[np.zeros(3), np.array([1.0, 0, 0])])
        model = da.ColorPathInterpolation(
            path, da.ColorMode.ABSOLUTE, values=[0.0, 2.0]
        )
        colors = np.array([[0.0, 0, 0], [0.5, 0, 0], [1.0, 0, 0]])
        out = model.call_array(colors)
        assert np.allclose(out, [0.0, 1.0, 2.0], atol=1e-4)

    def test_image_call_and_serialization(self, tmp_path):
        path = da.ColorPath(colors=[np.zeros(3), np.ones(3)])
        model = da.ColorPathInterpolation(path, da.ColorMode.ABSOLUTE)
        img = _image(np.full((4, 4, 3), 0.5))
        out = model(img)
        assert np.allclose(np.asarray(out.img), 0.5, atol=1e-4)
        model.save(tmp_path / "m.json")
        loaded = da.ColorPathInterpolation.load(tmp_path / "m.json")
        assert np.allclose(loaded.values, model.values)

    def test_label_variant(self):
        labels = np.zeros((4, 4), dtype=int)
        labels[:, 2:] = 1
        paths = {
            0: da.ColorPath(colors=[np.zeros(3), np.array([1.0, 0, 0])]),
            1: da.ColorPath(colors=[np.zeros(3), np.array([0, 1.0, 0])]),
        }
        model = da.LabelColorPathInterpolation(
            paths, labels, da.ColorMode.ABSOLUTE
        )
        img = np.zeros((4, 4, 3))
        img[..., 0] = 0.5  # half-way on label-0 path, off-path for label 1
        out = model.call_array(img)
        assert np.allclose(out[:, :2], 0.5, atol=1e-4)


class TestEmbeddings:
    def test_channel_embedding(self):
        img = _image(np.random.default_rng(3).uniform(size=(6, 6, 3)))

        class Rig:
            baseline = img

        emb = da.ColorChannelEmbedding(
            embedding_id="red",
            mode=da.ColorMode.ABSOLUTE,
            basis=da.ColorEmbeddingBasis.GLOBAL,
            color_space="RGB",
            channel="r",
        )
        runtime = da.ColorEmbeddingRuntime(rig=Rig())
        scalar = emb.to_scalar_image(img, runtime)
        assert np.allclose(np.asarray(scalar.img), np.asarray(img.img)[..., 0])
        # Cache hit second time.
        assert "red" in runtime.cache

    def test_range_embedding_hue_wraparound(self):
        # Red hue wraps around 360; range [350, 10] must catch h=5 and 355.
        from darsia_tpu.signals.color.color_embedding import (
            ColorRangeEmbeddingTransform,
        )

        hsv_red1 = np.array([1.0, 0.0, 0.0])  # h = 0
        hsv_blue = np.array([0.0, 0.0, 1.0])  # h = 240
        img = _image(np.stack([np.tile(hsv_red1, (4, 1)), np.tile(hsv_blue, (4, 1))]))
        transform = ColorRangeEmbeddingTransform(
            color_space="HSV",
            ranges=[(350.0, 10.0), (None, None), (None, None)],
            mode=da.ColorMode.ABSOLUTE,
        )
        out = np.asarray(transform(img).img)
        assert out[0].all() and not out[1].any()

    def test_basis_parsing(self):
        assert (
            da.parse_color_embedding_basis("labels")
            == da.ColorEmbeddingBasis.LABELS
        )
        assert da.calibration_basis_folder("facies") == "from_facies"


class TestRegression:
    def _setup(self):
        rng = np.random.default_rng(4)
        labels = np.zeros((16, 16), dtype=int)
        labels[:, 8:] = 1
        base = rng.uniform(0.4, 0.6, size=(16, 16, 3))
        baseline = _image(base)
        # Label 0 drifts toward +R, label 1 toward +G, increasing over time.
        images = []
        for strength in (0.3, 0.6):
            data = base.copy()
            data[:, :8, 0] += strength
            data[:, 8:, 1] += strength
            images.append(_image(data))
        mask = _image(np.ones((16, 16), dtype=bool))
        reg = da.LabelColorPathMapRegression(
            labels=_image(labels.astype(int)),
            resolution=11,
            mask=mask,
        )
        return reg, baseline, images

    def test_base_colors(self):
        reg, baseline, _ = self._setup()
        base_colors = reg.get_base_colors(baseline)
        assert set(base_colors.keys()) == {0, 1}
        assert np.all(np.abs(np.asarray(base_colors[0]) - 0.5) < 0.1)

    def test_spectrum_and_path(self):
        reg, baseline, images = self._setup()
        spectra = reg.get_color_spectrum(images, baseline=baseline)
        assert set(spectra.keys()) == {0, 1}
        paths = reg.find_color_path(spectra, num_segments=2)
        # Label 0's path must move dominantly along +R, label 1 along +G.
        end0 = paths[0].relative_colors[-1]
        end1 = paths[1].relative_colors[-1]
        assert end0[0] > 0.2 and abs(end0[1]) < 0.15
        assert end1[1] > 0.2 and abs(end1[0]) < 0.15

    def test_expand_spectrum(self):
        reg, baseline, images = self._setup()
        spectra = reg.get_color_spectrum(images, baseline=baseline)
        expanded = reg.expand_color_spectrum(spectra, iterations=1)
        assert len(expanded[0].occupancy) > len(spectra[0].occupancy)

    @staticmethod
    def _curved_spectrum(with_outliers=False):
        """An L-shaped relative color path: +R then +G (needs >= 2
        segments to fit), optionally with off-path outliers."""
        rng = np.random.default_rng(7)
        t = rng.uniform(0, 2, 600)
        colors = np.zeros((600, 3))
        first = t <= 1
        colors[first, 0] = t[first] * 0.5
        colors[~first, 0] = 0.5
        colors[~first, 1] = (t[~first] - 1) * 0.5
        colors += rng.normal(0, 0.01, colors.shape)
        if with_outliers:
            n_out = 30
            colors[:n_out] = rng.uniform(-0.2, 0.2, (n_out, 3)) + [0.1, -0.3, 0.4]
        spectrum = da.ColorSpectrum(resolution=21)
        spectrum.min_color = -np.ones(3)
        spectrum.max_color = np.ones(3)
        spectrum.accumulate(colors)
        return spectrum

    def test_rdp_fit_recovers_corner(self):
        """RDP segmentation places the interior node at the L-corner
        (reference's greedy error-driven splitting, :1276-1300)."""
        reg = da.LabelColorPathMapRegression(
            labels=_image(np.zeros((4, 4), dtype=int)), resolution=21
        )
        spectrum = self._curved_spectrum()
        path = reg._find_color_path(
            spectrum, num_segments=2, fit_mode="rdp", weighting="wls"
        )
        nodes = np.asarray(path.relative_colors)
        # Start ~origin, corner ~(0.5, 0, 0), end ~(0.5, 0.5, 0).
        assert np.linalg.norm(nodes[0]) < 0.1
        assert np.linalg.norm(nodes[1] - [0.5, 0.0, 0.0]) < 0.15
        assert np.linalg.norm(nodes[2] - [0.5, 0.5, 0.0]) < 0.15

    def test_rdp_fit_outlier_rejection(self):
        """The 80th-quantile segment error keeps the fit on-path despite
        5% gross outliers."""
        reg = da.LabelColorPathMapRegression(
            labels=_image(np.zeros((4, 4), dtype=int)), resolution=21
        )
        spectrum = self._curved_spectrum(with_outliers=True)
        path = reg._find_color_path(
            spectrum, num_segments=2, fit_mode="rdp", weighting="wls"
        )
        nodes = np.asarray(path.relative_colors)
        assert np.linalg.norm(nodes[1] - [0.5, 0.0, 0.0]) < 0.2
        assert np.linalg.norm(nodes[2] - [0.5, 0.5, 0.0]) < 0.2

    def test_fit_modes_agree_on_straight_path(self):
        rng = np.random.default_rng(9)
        t = rng.uniform(0, 1, 400)
        colors = np.outer(t, [0.4, 0.2, 0.0]) + rng.normal(0, 0.005, (400, 3))
        spectrum = da.ColorSpectrum(resolution=21)
        spectrum.min_color = -np.ones(3)
        spectrum.max_color = np.ones(3)
        spectrum.accumulate(colors)
        reg = da.LabelColorPathMapRegression(
            labels=_image(np.zeros((4, 4), dtype=int)), resolution=21
        )
        ends = []
        for mode in ("rdp", "lloyd"):
            path = reg._find_color_path(
                spectrum, num_segments=1, fit_mode=mode, weighting="wls"
            )
            ends.append(np.asarray(path.relative_colors[-1]))
        # Both fitters recover the same path direction; end-node positions
        # may differ by ~1 histogram bin (bin width 0.1 at resolution 21).
        dir0 = ends[0] / np.linalg.norm(ends[0])
        dir1 = ends[1] / np.linalg.norm(ends[1])
        assert float(dir0 @ dir1) > 0.99
        assert np.linalg.norm(ends[0] - ends[1]) < 0.2


class TestColorPathExtension:
    def test_refine_extends_path(self):
        """refine(distance_to_left/right) extrapolates beyond the ends
        (reference color_path.py:363-403)."""
        path = da.ColorPath(
            base_color=np.zeros(3),
            relative_colors=[np.zeros(3), np.array([0.4, 0.0, 0.0])],
        )
        extended = path.refine(
            num_segments=2, distance_to_left=-0.5, distance_to_right=1.5
        )
        nodes = np.asarray(extended.relative_colors)
        assert nodes.shape[0] == 5  # left + 3 + right
        np.testing.assert_allclose(nodes[0], [-0.2, 0, 0], atol=1e-6)
        np.testing.assert_allclose(nodes[-1], [0.6, 0, 0], atol=1e-6)
        np.testing.assert_allclose(nodes[2], [0.2, 0, 0], atol=1e-6)
