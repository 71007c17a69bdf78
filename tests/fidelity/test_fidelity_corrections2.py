"""Fidelity: second correction/restoration cluster vs the reference.

Patchwise illumination, generalized perspective fits, axis reduction,
coordinate transformations, H1 regularization, resize variants, and the
EMD distance-matrix path.
"""

import numpy as np
import pytest

import darsia_tpu as dt


class TestPatchwiseIlluminationFidelity:
    def test_correction_field_matches(self, ref):
        """Patch-median illumination ratio grid, upsampled to full image
        (reference patchwiseilluminationcorrection.py:148-230)."""
        rng = np.random.default_rng(50)
        n = 256
        yy, xx = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij")
        shading = 0.7 + 0.3 * np.exp(-2 * ((yy - 0.5) ** 2 + (xx - 0.5) ** 2))
        flat = 0.5 * np.ones((n, n, 3)) + 0.05 * rng.random((n, n, 3))
        # uint8 frames: the reference's correction math targets camera
        # images (float input collapses to zeros through its uint8 cast).
        shaded = (np.clip(flat * shading[..., None], 0, 1) * 255).astype(
            np.uint8
        )
        meta = {"width": 1.0, "height": 1.0}
        r_img = ref.Image(shaded.copy(), **meta)
        o_img = dt.Image(shaded.copy(), **meta)
        # limit below the image height (the reference defaults target 4K
        # rigs: limit=1450 rows would exceed this synthetic image).
        r_corr = ref.PatchwiseIlluminationCorrection(
            image=r_img, baseline_images=[r_img], nw=16, limit=64,
            show_images=False,
        )
        o_corr = dt.PatchwiseIlluminationCorrection(
            image=o_img, baseline_images=[o_img], nw=16, limit=64,
            show_images=False,
        )
        probe = shaded.copy()
        r_out = np.asarray(
            r_corr(ref.Image(probe.copy(), **meta)).img, dtype=float
        )
        o_out = np.asarray(
            o_corr(dt.Image(probe.copy(), **meta)).img, dtype=float
        )
        if o_out.max() <= 1.5:  # ours may normalize to [0, 1]
            o_out = o_out * 255.0
        assert r_out.shape == o_out.shape
        # Both flatten the illumination to the same field (uint8 scale;
        # the reference outputs patch-quantized medians, ours preserves
        # per-pixel texture — compare within the pixel-noise band).
        assert np.abs(r_out - o_out).max() < 16.0
        assert np.abs(r_out - o_out).mean() < 4.0
        assert r_out[..., 0].std() < np.asarray(shaded[..., 0], float).std()


class TestGeneralizedPerspectiveFidelity:
    def test_fit_and_map(self, ref):
        """12+-parameter perspective+bulge fit by least squares
        (reference generalizedperspective.py:16-260)."""
        rng = np.random.default_rng(51)
        pts = rng.random((12, 2)) * np.array([100.0, 140.0])
        # Synthetic mild perspective distortion.
        A = np.array([[1.02, 0.03], [-0.02, 0.99]])
        t = np.array([2.0, -3.0])
        denom = 1.0 + 1e-4 * pts[:, 0] + 5e-5 * pts[:, 1]
        mapped = (pts @ A.T + t) / denom[:, None]
        r_trafo = ref.GeneralizedPerspectiveTransformation()
        o_trafo = dt.GeneralizedPerspectiveTransformation()
        r_canvas = ref.Image(np.zeros((100, 140)), width=1.4, height=1.0, scalar=True)
        o_canvas = dt.Image(np.zeros((100, 140)), width=1.4, height=1.0, scalar=True)
        r_trafo.fit(
            ref.VoxelArray(pts), ref.VoxelArray(mapped),
            fit_options={"coordinatesystem_dst": r_canvas.coordinatesystem},
        )
        o_trafo.fit(
            dt.VoxelArray(pts), dt.VoxelArray(mapped),
            fit_options={"coordinatesystem_dst": o_canvas.coordinatesystem},
        )
        probe = rng.random((6, 2)) * np.array([100.0, 140.0])
        # Upstream the forward call_array is a NotImplementedError stub
        # (ref generalizedperspective.py:95); only the inverse evaluation
        # is implemented — compare that.
        r_mapped = np.asarray(r_trafo.inverse_array(probe.copy()), dtype=float)
        o_mapped = np.asarray(o_trafo.inverse_array(probe.copy()), dtype=float)
        # Independently-converged 12-parameter least-squares fits: allow a
        # few pixels of optimizer slack, and require both to actually
        # invert the synthetic distortion on the fit points.
        assert np.abs(r_mapped - o_mapped).max() <= 3.0
        r_inv = np.asarray(r_trafo.inverse_array(mapped.copy()), dtype=float)
        o_inv = np.asarray(o_trafo.inverse_array(mapped.copy()), dtype=float)
        assert np.abs(r_inv - pts).max() <= 2.5
        assert np.abs(o_inv - pts).max() <= 2.5


class TestAxisReductionFidelity:
    @pytest.mark.parametrize("mode", ["average", "sum"])
    def test_depth_average(self, ref, mode):
        rng = np.random.default_rng(52)
        data = rng.random((8, 10, 6))
        meta = {"dimensions": [1.0, 1.0, 0.5], "space_dim": 3, "series": False,
                "scalar": True}
        r_img = ref.Image(data.copy(), **meta)
        o_img = dt.Image(data.copy(), **meta)
        r_red = ref.AxisReduction(axis=2, dim=3, mode=mode)
        o_red = dt.AxisReduction(axis=2, dim=3, mode=mode)
        r_out = r_red(r_img)
        o_out = o_red(o_img)
        assert np.asarray(r_out.img).shape == np.asarray(o_out.img).shape
        assert np.allclose(
            np.asarray(r_out.img), np.asarray(o_out.img), atol=1e-10
        )


class TestCoordinateTransformationFidelity:
    def test_image_to_image_mapping(self, ref):
        rng = np.random.default_rng(53)
        data = rng.random((40, 50)).astype(np.float32)
        meta_src = {"width": 1.0, "height": 0.8, "scalar": True}
        meta_dst = {"width": 1.0, "height": 0.8, "scalar": True}

        def build(mod):
            src_img = mod.Image(data.copy(), **meta_src)
            dst_img = mod.Image(np.zeros((40, 50), np.float32), **meta_dst)
            pts_src = mod.VoxelArray(
                np.array([[5, 5], [35, 5], [5, 45], [35, 45]])
            )
            pts_dst = mod.VoxelArray(
                np.array([[7, 6], [37, 6], [7, 46], [37, 46]])
            )
            trafo = mod.CoordinateTransformation(
                src_img.coordinatesystem,
                dst_img.coordinatesystem,
                pts_src,
                pts_dst,
                fit_options={"isometry": False},
            )
            return np.asarray(trafo(src_img).img)

        r_out = build(ref)
        o_out = build(dt)
        # The reference keeps the full dst canvas (its find_intersection is
        # dead code upstream: ref coordinatetransformation.py:128 hits
        # `assert False, "TODO..."`); we return the valid intersection.
        # The intersection content must appear verbatim inside the
        # reference canvas at some small offset.
        oh, ow = o_out.shape
        best = np.inf
        for dy in range(r_out.shape[0] - oh + 1):
            for dx in range(r_out.shape[1] - ow + 1):
                crop = r_out[dy : dy + oh, dx : dx + ow]
                sl = (slice(8, -8), slice(8, -8))
                best = min(best, float(np.abs(crop[sl] - o_out[sl]).max()))
        assert best < 0.05, best


class TestH1RegularizationFidelity:
    def test_h1_matches(self, ref):
        rng = np.random.default_rng(54)
        noisy = rng.standard_normal((24, 30))
        r_out = np.asarray(
            ref.H1_regularization(
                noisy.copy(), mu=0.5, omega=1.0, dim=2,
                solver=ref.Jacobi(maxiter=100),
            )
        )
        o_out = np.asarray(
            dt.H1_regularization(
                noisy.copy(), mu=0.5, omega=1.0, dim=2,
                solver=dt.Jacobi(maxiter=100),
            )
        )
        scale = np.abs(r_out).max()
        assert np.abs(o_out - r_out).max() <= 2e-3 * scale


class TestResizeVariantsFidelity:
    def test_fx_fy_resize(self, ref):
        rng = np.random.default_rng(55)
        data = rng.random((30, 40, 3)).astype(np.float32)
        meta = {"width": 1.0, "height": 0.75}
        r_out = ref.Resize(fx=0.5, fy=0.5)(ref.Image(data.copy(), **meta))
        o_out = dt.Resize(fx=0.5, fy=0.5)(dt.Image(data.copy(), **meta))
        assert np.asarray(r_out.img).shape == np.asarray(o_out.img).shape
        assert np.allclose(np.asarray(r_out.img), np.asarray(o_out.img), atol=1e-5)

    def test_equalize_voxel_size(self, ref):
        rng = np.random.default_rng(56)
        data = rng.random((20, 60)).astype(np.float32)
        meta = {"width": 3.0, "height": 1.0, "scalar": True}
        r_img = ref.Image(data.copy(), **meta)
        o_img = dt.Image(data.copy(), **meta)
        r_eq = ref.equalize_voxel_size(r_img)
        o_eq = dt.equalize_voxel_size(o_img)
        assert np.asarray(r_eq.img).shape == np.asarray(o_eq.img).shape
        assert np.allclose(
            np.asarray(r_eq.img), np.asarray(o_eq.img), atol=1e-5
        )


class TestEMDMatrixFidelity:
    def test_distance_matrix(self, ref):
        """EMD over an image collection (reference emd.py:206-263)."""
        rng = np.random.default_rng(57)
        meta = {"width": 1.0, "height": 1.0, "scalar": True}

        def blobs(mod):
            imgs = []
            for c in ((0.3, 0.3), (0.6, 0.5), (0.4, 0.7)):
                yy, xx = np.meshgrid(
                    np.linspace(0, 1, 12), np.linspace(0, 1, 12), indexing="ij"
                )
                arr = np.exp(-30 * ((yy - c[0]) ** 2 + (xx - c[1]) ** 2))
                imgs.append(mod.Image(arr / arr.sum(), **meta))
            return imgs

        r_imgs = blobs(ref)
        o_imgs = blobs(dt)
        r_emd = ref.EMD()
        o_emd = dt.EMD()
        for i in range(3):
            for j in range(i + 1, 3):
                r_d = float(r_emd(r_imgs[i], r_imgs[j]))
                o_d = float(o_emd(o_imgs[i], o_imgs[j]))
                assert np.isclose(r_d, o_d, rtol=1e-6), (i, j, r_d, o_d)


class TestSeriesCorrectionFidelity:
    def test_series_correction_matches_reference_slice_loop(self, ref):
        """A time-series image through a correction: the reference walks
        time slices in Python (basecorrection.py:44-69); ours vmaps the
        batch over the time axis (corrections/base.py) — results must
        agree slice for slice."""
        rng = np.random.default_rng(7)
        H, W, T = 48, 64, 3
        series = (rng.random((H, W, T, 3)) * 255).astype(np.uint8)
        meta = {"width": 1.0, "height": 1.0, "series": True}

        r_img = ref.Image(series.copy(), **meta)
        o_img = dt.Image(series.copy(), **meta)
        dx, dy = 1.5, -0.75  # pixel shifts (fractional: exercises interp)
        r_corr = ref.TranslationCorrection()
        r_corr.translation = np.array(
            [[1.0, 0.0, dx], [0.0, 1.0, dy]], dtype=float
        )
        r_corr.active = True
        o_corr = dt.TranslationCorrection([dx, dy])
        r_out = np.asarray(r_corr(r_img).img, dtype=float)
        o_out = np.asarray(o_corr(o_img).img, dtype=float)
        assert r_out.shape == o_out.shape
        # interior (interpolation boundary handling differs at the edge)
        inner = (slice(4, -4), slice(4, -4))
        for t in range(T):
            diff = np.abs(r_out[:, :, t][inner] - o_out[:, :, t][inner])
            assert diff.mean() < 2.0  # uint8 scale
