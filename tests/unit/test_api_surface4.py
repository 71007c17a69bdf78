"""Fourth API-surface cluster: direct exercises of names previously only
covered indirectly (indexing converters, imread variants, point/box/slices
utils, Beckmann solver classes, registries, plotting helpers)."""

import os

import numpy as np
import pytest

import darsia_tpu as da

META = {"width": 1.0, "height": 1.0, "scalar": True}


class TestIndexingConverters:
    def test_matrix_cartesian_roundtrip(self):
        arr = np.arange(12.0).reshape(3, 4)
        cart = da.matrixToCartesianIndexing(arr)
        back = da.cartesianToMatrixIndexing(cart)
        assert np.array_equal(back, arr)
        # axis-name converters: Cartesian scheme -> matrix axis and back.
        assert da.to_matrix_indexing("x", "xy") == "j"
        assert da.to_cartesian_indexing("j", "ij") == "x"
        assert da.to_matrix_indexing("z", "xyz") == "i"

    def test_voxel_center_conversions(self):
        img = da.Image(np.zeros((10, 12)), **META)
        center = da.to_voxel_center([3, 4])
        assert np.allclose(np.asarray(center), [3.5, 4.5])
        coord = da.to_coordinate(
            da.make_voxel_center([3, 4]), img.coordinatesystem
        )
        voxel = da.to_voxel(np.asarray(coord), img.coordinatesystem)
        assert np.array_equal(np.asarray(voxel), [3, 4])


class TestImreadVariants:
    def test_imread_from_numpy_npz_bytes(self, tmp_path):
        rng = np.random.default_rng(0)
        arr = rng.random((12, 14, 3)).astype(np.float32)
        img = da.imread_from_numpy(arr, width=1.0, height=1.0)
        assert img.img.shape == (12, 14, 3)
        # npz roundtrip
        path = tmp_path / "img.npz"
        img.save(path)
        loaded = da.imread_from_npz(path)
        assert np.allclose(np.asarray(loaded.img), arr, atol=1e-6)
        # bytes (encoded jpg)
        import cv2

        ok, buf = cv2.imencode(".png", (arr * 255).astype(np.uint8))
        assert ok
        from_bytes = da.imread_from_bytes(bytes(buf), width=1.0, height=1.0)
        assert from_bytes.img.shape[:2] == (12, 14)

    def test_imread_from_optical_real_file(self):
        path = "/root/reference/examples/images/baseline.jpg"
        if not os.path.exists(path):
            pytest.skip("sample image unavailable")
        img = da.imread_from_optical(path, width=2.8, height=1.5)
        assert img.img.ndim == 3

    def test_gated_readers_raise_cleanly(self, tmp_path):
        # pydicom/meshio are absent here: the readers must fail with an
        # informative ImportError, not crash at import time.
        for fn, suffix in (
            (da.imread_from_dicom, "x.dcm"),
            (da.imread_from_vtu, "x.vtu"),
        ):
            target = tmp_path / suffix
            target.write_bytes(b"")
            with pytest.raises(Exception) as err:
                fn([target] if "dicom" in fn.__name__ else target)
            assert err.type in (ImportError, FileNotFoundError, ValueError)


class TestBoxSliceUtils:
    def test_bounding_box_inverse_roundtrip(self):
        voxels = np.array([[2, 3], [8, 11]])
        box = da.bounding_box(voxels)
        corners = da.bounding_box_inverse(box)
        assert da.bounding_box(np.asarray(corners)) == box

    def test_random_patches_cover_shape(self):
        rng = np.random.default_rng(1)
        patches = da.random_patches((40, 40), width=8, num_patches=5, rng=rng)
        assert len(patches) == 5
        arr = rng.random((40, 40))
        for sl in patches:
            assert arr[sl].shape == (8, 8)

    def test_slice_pair_arithmetic(self):
        a = (slice(2, 10), slice(3, 12))
        b = (slice(1, 2), slice(2, 3))
        added = da.add_slice_pairs(a, b)
        assert added[0].start == 3 and added[1].start == 5
        subbed = da.subtract_slice_pairs(added, b)
        assert subbed[0].start == a[0].start and subbed[1].stop == a[1].stop

    def test_array_slice_helpers(self):
        arr = np.arange(24).reshape(4, 6)
        sl = da.array_slice_argument(arr, 0, 1, 3)
        assert np.array_equal(arr[sl], arr[1:3, :])
        prod = da.array_product(np.array([1.0, 2.0]), np.array([3.0, 4.0]))
        assert np.asarray(prod).size >= 1


class TestBeckmannSolverClasses:
    def _problem(self):
        src = np.zeros((10, 10))
        src[2:5, 2:5] = 1
        dst = np.zeros((10, 10))
        dst[1:3, 1:2] = 1
        dst[4:7, 7:9] = 1
        s, d = da.Image(src, **META), da.Image(dst, **META)
        g = da.Geometry(**s.shape_metadata())
        s.img = np.asarray(s.img) / g.integrate(s)
        d.img = np.asarray(d.img) / g.integrate(d)
        return s, d

    def test_newton_solver_class_direct(self):
        s, d = self._problem()
        solver = da.BeckmannNewtonSolver(
            da.generate_grid(d), None, {"num_iter": 150, "tol_distance": 1e-5}
        )
        dist = solver(s, d)
        assert 0.3 < float(dist) < 0.45

    def test_linear_solver_factory(self):
        for name in ("direct", "amg", "cg", "ksp", "ksp-fieldsplit"):
            solver = da.BeckmannLinearSolverFactory.create(
                name, (12, 12), {"rtol": 1e-8}
            )
            assert isinstance(solver, da.BeckmannLinearSolver)
        assert (
            da.BeckmannLinearSolverType("amg")
            == da.BeckmannLinearSolverType.AMG
        )

    def test_convergence_machinery(self):
        criteria = da.BeckmannConvergenceCriteria(num_iter=5)
        history = da.BeckmannConvergenceHistory()
        history.append(distance=1.0, distance_increment=0.1, residual=0.5,
                       increment=0.2)
        data = history.as_dict()
        assert "distance" in data and len(data["distance"]) == 1
        assert da.ConvergenceStatus.CONVERGED.value in (
            "converged", "CONVERGED"
        )


class TestMiscUtils:
    def test_timing_decorator_passthrough(self):
        @da.timing_decorator
        def plus_one(x):
            return x + 1

        assert plus_one(41) == 42

    def test_flatten_unflatten_index(self):
        idx = np.array([[2, 3, 1]])
        flat = da.flatten_index(idx, resolution=5)
        back = da.unflatten_index(np.asarray(flat), resolution=5)
        assert np.array_equal(np.asarray(back).reshape(-1, 3), idx)

    def test_get_mean_color(self):
        img = da.Image(np.stack([
            np.full((6, 6), 0.2), np.full((6, 6), 0.4), np.full((6, 6), 0.6)
        ], axis=-1), width=1.0, height=1.0)
        mean = np.asarray(da.get_mean_color(img))
        assert np.allclose(mean, [0.2, 0.4, 0.6], atol=1e-6)

    def test_ones_like_and_extrude(self):
        img = da.Image(np.zeros((4, 5)), **META)
        ones = da.ones_like(img)
        assert np.all(np.asarray(ones.img) == 1.0)
        reduced = da.AxisReduction(axis=2, dim=3, mode="average")
        volume = da.Image(
            np.random.default_rng(2).random((4, 5, 3)),
            dimensions=[1.0, 1.0, 1.0], space_dim=3, series=False, scalar=True,
        )
        flat = reduced(volume)
        extruded = da.extrude_along_axis(flat, height=1.0, num=3)
        # Extrusion prepends the new axis; total voxel count matches.
        assert np.asarray(extruded.img).size == 4 * 5 * 3

    def test_plotting_helpers_run_headless(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        img = da.Image(
            np.random.default_rng(3).random((12, 12)), **META
        )
        da.plot_image_statistics(img, path=tmp_path / "stats.png")
        assert (tmp_path / "stats.png").exists()
