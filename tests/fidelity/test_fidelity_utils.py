"""Fidelity: utility layer vs the reference — characteristic-color
extraction (kmeans), spatial interpolation to images, boxes/voxels, dtype
conversion, and watershed-label helpers.
"""

import numpy as np
import pytest

import darsia_tpu as dt


class TestCharacteristicDataFidelity:
    def test_dominant_cluster_color(self, ref):
        """kmeans characteristic color of a noisy two-population signal
        (reference utils/extractcharacteristicdata.py:189)."""
        rng = np.random.default_rng(60)
        n = 40
        signal = np.empty((n, n, 3))
        # 80% population around c1, 20% around c2.
        c1, c2 = np.array([0.2, 0.5, 0.7]), np.array([0.8, 0.3, 0.1])
        pick = rng.random((n, n)) < 0.8
        signal[pick] = c1 + 0.02 * rng.standard_normal((pick.sum(), 3))
        signal[~pick] = c2 + 0.02 * rng.standard_normal(((~pick).sum(), 3))
        r_color = np.asarray(
            ref.extract_characteristic_data(
                signal.copy(), num_clusters=3, show_plot=False
            )
        )
        o_color = np.asarray(
            dt.extract_characteristic_data(
                signal.copy(), num_clusters=3, show_plot=False
            )
        )
        # Both find the dominant population's color.
        assert np.allclose(r_color, c1, atol=0.02)
        assert np.allclose(o_color, c1, atol=0.02)
        assert np.allclose(r_color, o_color, atol=0.02)

    def test_masked_extraction(self, ref):
        rng = np.random.default_rng(61)
        n = 30
        signal = 0.5 + 0.01 * rng.standard_normal((n, n, 3))
        signal[:, : n // 2] = [0.9, 0.1, 0.1]
        mask = np.zeros((n, n), dtype=bool)
        mask[:, n // 2 :] = True  # restrict to the flat half
        r_color = np.asarray(
            ref.extract_characteristic_data(
                signal.copy(), mask=mask.copy(), num_clusters=2, show_plot=False
            )
        )
        o_color = np.asarray(
            dt.extract_characteristic_data(
                signal.copy(), mask=mask.copy(), num_clusters=2, show_plot=False
            )
        )
        assert np.allclose(r_color, [0.5, 0.5, 0.5], atol=0.02)
        assert np.allclose(o_color, r_color, atol=0.02)


class TestInterpolationFidelity:
    @pytest.mark.parametrize("method", ["rbf", "linear", "quadratic"])
    def test_interpolate_to_image(self, ref, method):
        """Scattered measurements -> smooth field on the image canvas
        (reference utils/interpolation.py:196)."""
        rng = np.random.default_rng(62)
        coords_x = np.array([0.1, 0.5, 0.9, 0.3, 0.7, 0.2, 0.8, 0.5])
        coords_y = np.array([0.1, 0.2, 0.1, 0.5, 0.5, 0.8, 0.8, 0.9])
        values = 1.0 + coords_x + 2.0 * coords_y  # exactly linear field
        meta = {"width": 1.0, "height": 1.0, "scalar": True}
        r_img = ref.Image(np.zeros((25, 25)), **meta)
        o_img = dt.Image(np.zeros((25, 25)), **meta)
        data = (coords_x.copy(), coords_y.copy(), values.copy())
        r_out = np.asarray(ref.interpolate_to_image(data, r_img, method=method).img)
        o_out = np.asarray(dt.interpolate_to_image(data, o_img, method=method).img)
        assert r_out.shape == o_out.shape
        assert np.abs(r_out - o_out).max() < 0.05
        # A linear field must be reproduced (checks axis conventions).
        mid = r_out[12, 12]
        assert abs(mid - (1.0 + 0.5 + 2.0 * 0.5)) < 0.1


class TestDtypeFidelity:
    @pytest.mark.parametrize(
        "target", ["uint8", "uint16", "float32", "float64"]
    )
    def test_convert_dtype(self, ref, target):
        rng = np.random.default_rng(63)
        img = rng.random((8, 9)).astype(np.float64)
        r_out = ref.convert_dtype(img.copy(), np.dtype(target))
        o_out = dt.convert_dtype(img.copy(), np.dtype(target))
        assert np.asarray(r_out).dtype == np.asarray(o_out).dtype
        assert np.allclose(
            np.asarray(r_out, dtype=float), np.asarray(o_out, dtype=float)
        )

    def test_convert_roundtrip(self, ref):
        rng = np.random.default_rng(64)
        img = (rng.random((8, 9)) * 255).astype(np.uint8)
        r_f = ref.convert_dtype(img.copy(), np.dtype("float64"))
        o_f = dt.convert_dtype(img.copy(), np.dtype("float64"))
        assert np.allclose(np.asarray(r_f), np.asarray(o_f))
        r_back = ref.convert_dtype(np.asarray(r_f), np.dtype("uint8"))
        o_back = dt.convert_dtype(np.asarray(o_f), np.dtype("uint8"))
        assert np.array_equal(np.asarray(r_back), np.asarray(o_back))


class TestBoxVoxelFidelity:
    def test_make_coordinate_voxel(self, ref):
        pts = [[0.25, 0.75], [0.5, 0.5]]
        r_c = np.asarray(ref.make_coordinate(list(pts)))
        o_c = np.asarray(dt.make_coordinate(list(pts)))
        assert np.allclose(r_c, o_c)
        r_v = np.asarray(ref.make_voxel([[3, 4], [5, 6]]))
        o_v = np.asarray(dt.make_voxel([[3, 4], [5, 6]]))
        assert np.array_equal(r_v, o_v)

    def test_voxel_coordinate_conversion_on_image(self, ref):
        data = np.zeros((20, 30))
        meta = {"width": 3.0, "height": 2.0, "scalar": True}
        r_img = ref.Image(data.copy(), **meta)
        o_img = dt.Image(data.copy(), **meta)
        voxels = [[0, 0], [10, 15], [19, 29]]
        r_coords = np.asarray(
            ref.make_voxel(voxels).to_coordinate(r_img.coordinatesystem)
        )
        o_coords = np.asarray(
            dt.make_voxel(voxels).to_coordinate(o_img.coordinatesystem)
        )
        assert np.allclose(r_coords, o_coords, atol=1e-12)


class TestLabelHelpersFidelity:
    def test_make_consecutive_and_counting(self, ref):
        labels = np.array(
            [[0, 0, 3, 3], [0, 7, 7, 3], [9, 9, 7, 3], [9, 9, 9, 9]]
        )
        meta = {"width": 1.0, "height": 1.0, "scalar": True}
        r_img = ref.Image(labels.copy(), **meta)
        o_img = dt.Image(labels.copy(), **meta)
        def unwrap(result):
            if isinstance(result, tuple):
                result = result[0]
            return np.asarray(result.img if hasattr(result, "img") else result)

        r_out = unwrap(ref.make_consecutive(r_img))
        o_out = unwrap(dt.make_consecutive(o_img))
        assert np.array_equal(r_out, o_out)
        assert sorted(np.unique(r_out)) == [0, 1, 2, 3]
