"""Behavior tests for previously untested public-API surfaces.

Closes the test-depth gap vs the reference's 406-test suite: points,
restoration utilities, geometry variants, corrections, kernels, VTK
export, thermodynamic tables, and misc utils.
"""

import numpy as np
import pytest

import darsia_tpu as da


class TestPointsAndIndexing:
    def test_voxel_roundtrip(self):
        v = da.make_voxel([3, 4])
        assert isinstance(v, (da.Voxel, np.ndarray))
        arr = da.make_voxel([[1, 2], [3, 4]])
        assert np.asarray(arr).shape == (2, 2)

    def test_voxel_center(self):
        vc = da.make_voxel_center([2, 5])
        np.testing.assert_allclose(np.asarray(vc), [2.5, 5.5])

    def test_indexing_conversions(self):
        axis, revert = da.interpret_indexing("x", "ij")
        assert axis == 1 and revert is False
        axis, revert = da.interpret_indexing("y", "ij")
        assert axis == 0 and revert is True

    def test_check_equal_coordinatesystems(self):
        img1 = da.Image(np.zeros((4, 6)), width=2.0, height=1.0, scalar=True)
        img2 = da.Image(np.zeros((4, 6)), width=2.0, height=1.0, scalar=True)
        equal, log = da.check_equal_coordinatesystems(
            img1.coordinatesystem, img2.coordinatesystem
        )
        assert equal, log
        img3 = da.Image(np.zeros((4, 6)), width=3.0, height=1.0, scalar=True)
        equal, log = da.check_equal_coordinatesystems(
            img1.coordinatesystem, img3.coordinatesystem
        )
        assert not equal and log


class TestRestorationUtilities:
    def test_median_filter(self):
        arr = np.zeros((16, 16), np.float32)
        arr[8, 8] = 100.0  # salt noise
        img = da.ScalarImage(arr, width=1, height=1)
        out = da.Median(**{"median disk radius": 2})(img)
        assert float(np.asarray(out.img)[8, 8]) == 0.0

    def test_volume_averaging_rev(self):
        arr = np.random.default_rng(0).random((24, 24)).astype(np.float32)
        img = da.ScalarImage(arr, width=1, height=1)
        rev = da.REV(size=0.25, img=img)
        mask = da.ScalarImage(np.ones((24, 24), bool), width=1, height=1)
        averaged = da.VolumeAveraging(rev, mask)(img)
        out = np.asarray(averaged.img)
        # Averaging preserves the mean and reduces variance.
        assert np.mean(out) == pytest.approx(np.mean(arr), rel=0.05)
        assert np.var(out) < np.var(arr)

    def test_binary_cleanup(self):
        mask = np.zeros((32, 32), bool)
        mask[4:20, 4:20] = True
        mask[10:12, 10:12] = False  # hole
        mask[28, 28] = True  # speck
        # These operate on raw binary arrays (reference binaryinpaint.py).
        filled = da.BinaryFillHoles(area_threshold=16)(mask)
        assert filled[11, 11]
        cleaned = da.BinaryRemoveSmallObjects(min_size=4)(mask)
        assert not cleaned[28, 28]
        assert cleaned[10, 5]

    def test_equalize_and_refine(self):
        img = da.ScalarImage(
            np.random.default_rng(1).random((10, 40)).astype(np.float32),
            width=4.0,
            height=1.0,
        )
        eq = da.equalize_voxel_size(img)
        vs = eq.voxel_size
        assert vs[0] == pytest.approx(vs[1])
        refined = da.uniform_refinement(img, 1)
        assert tuple(refined.num_voxels) == (20, 80)

    def test_resize_array_conservative(self):
        data = np.random.default_rng(2).random((8, 8)).astype(np.float32)
        out = np.asarray(
            da.resize_array(data, (4, 4), "inter_area", conservative=True)
        )
        assert float(out.sum()) == pytest.approx(float(data.sum()), rel=1e-5)


class TestGeometryVariants:
    def test_weighted_geometry(self):
        weight = 2.0 * np.ones((4, 6))
        geom = da.WeightedGeometry(weight, 2, (4, 6), dimensions=[1.0, 1.0])
        assert geom.integrate(np.ones((4, 6))) == pytest.approx(2.0)

    def test_extruded_geometry(self):
        geom = da.ExtrudedGeometry(
            0.5 * np.ones((4, 6)), 2, (4, 6), dimensions=[1.0, 1.0]
        )
        assert geom.integrate(np.ones((4, 6))) == pytest.approx(0.5)


class TestVtkExport:
    def test_to_vtk_and_wasserstein_export(self, tmp_path):
        rows = cols = 8
        src = np.zeros((rows, cols))
        src[2:5, 2:5] = 1
        dst = np.zeros((rows, cols))
        dst[4:7, 4:7] = 1
        meta = {"width": 1, "height": 1, "scalar": True}
        s, d = da.Image(src, **meta), da.Image(dst, **meta)
        g = da.Geometry(**s.shape_metadata())
        s.img = np.asarray(s.img) / g.integrate(s)
        d.img = np.asarray(d.img) / g.integrate(d)
        _, info = da.wasserstein_distance(
            s, d, method="newton",
            options={"num_iter": 30, "return_info": True, "L": 1e9},
        )
        out = tmp_path / "w1"
        da.wasserstein_distance_to_vtk(out, info)
        produced = list(tmp_path.glob("w1*"))
        assert produced, "VTK export produced no file"
        assert produced[0].stat().st_size > 0


class TestCorrectionsExtra:
    def test_affine_correction_translation(self):
        src = da.Image(np.zeros((16, 16)), width=1.0, height=1.0, scalar=True)
        dst = da.Image(np.zeros((16, 16)), width=1.0, height=1.0, scalar=True)
        pts_src = da.make_voxel([[2, 2], [2, 12], [12, 2], [12, 12]])
        pts_dst = da.make_voxel([[4, 2], [4, 12], [14, 2], [14, 12]])
        correction = da.AffineCorrection(
            src.coordinatesystem,
            dst.coordinatesystem,
            pts_src=pts_src,
            pts_dst=pts_dst,
        )
        arr = np.zeros((16, 16), np.float32)
        arr[2, 2] = 1.0
        img = da.ScalarImage(arr, width=1.0, height=1.0)
        out = np.asarray(correction(img).img)
        # The unit spike moved two rows down.
        assert out[4, 2] == pytest.approx(1.0, abs=0.1)

    def test_correction_registry_roundtrip(self, tmp_path):
        correction = da.TypeCorrection(np.float32)
        correction.save(tmp_path / "c")
        restored = da.read_correction(tmp_path / "c.npz")
        assert type(restored).__name__ == "TypeCorrection"


class TestThermodynamics:
    def test_property_tables_physical(self):
        rho_w = da.water_density(20.0)
        assert 990 < rho_w < 1000
        rho_g = da.co2_gas_density(1.01325, 20.0)
        assert 1.5 < rho_g < 2.2
        sol = da.co2_solubility(1.01325, 20.0)
        assert 1.0 < sol < 2.5  # kg CO2 / m^3 water at ~1 atm

    def test_solubility_monotone_in_pressure(self):
        assert da.co2_solubility(2.0, 20.0) > da.co2_solubility(1.0, 20.0)

    def test_gas_density_monotone_in_temperature(self):
        assert da.co2_gas_density(1.0, 10.0) > da.co2_gas_density(1.0, 40.0)


class TestMiscUtils:
    def test_kmeans_separates_clusters(self):
        rng = np.random.default_rng(3)
        a = rng.normal(0.0, 0.05, (50, 2))
        b = rng.normal(1.0, 0.05, (50, 2))
        labels, centers = da.kmeans(np.vstack([a, b]), 2)
        assert sorted(
            np.round(np.asarray(centers).mean(axis=1), 1).tolist()
        ) == [0.0, 1.0]
        assert len(set(labels[:50])) == 1 and len(set(labels[50:])) == 1

    def test_scharr_and_boundaries(self):
        img = np.zeros((16, 16), np.float32)
        img[:, 8:] = 1.0
        edges = da.scharr_edges(img)
        assert edges[:, 7:9].max() > edges[:, :4].max()
        labels = (img > 0.5).astype(int)
        boundary = da.find_boundaries(labels)
        assert boundary[:, 7:9].any()
        assert not boundary[:, :5].any()

    def test_bounding_box(self):
        voxels = np.array([[2, 3], [5, 9]])
        box = da.bounding_box(voxels, padding=1, max_size=[16, 16])
        assert box == (slice(1, 6), slice(2, 10))

    def test_interpolate_to_image_rbf(self):
        image = da.ScalarImage(np.zeros((20, 20)), width=1.0, height=1.0)
        # Linear field sampled at scattered coordinates: x + 2y.
        x = np.array([0.2, 0.8, 0.2, 0.8, 0.5])
        y = np.array([0.2, 0.2, 0.8, 0.8, 0.5])
        values = x + 2 * y
        out = da.interpolate_to_image((x, y, values), image, method="rbf")
        arr = np.asarray(out.img)
        mid = arr[10, 10]
        assert mid == pytest.approx(1.5, abs=0.1)

    def test_linalg_wrappers(self):
        rng = np.random.default_rng(4)
        M = rng.random((6, 6))
        A = M @ M.T + 6 * np.eye(6)
        b = rng.random(6)
        x, info = da.linalg_cg(A, b, tol=1e-10)
        assert info == 0
        np.testing.assert_allclose(A @ np.asarray(x), b, atol=1e-6)
        x2, info2 = da.linalg_gmres(A, b, tol=1e-10)
        np.testing.assert_allclose(A @ np.asarray(x2), b, atol=1e-5)
