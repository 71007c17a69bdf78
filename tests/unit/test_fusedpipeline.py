"""FusedAnalysisPipeline: one-program full path == staged public path.

The composite program (correction warp -> fused registration -> fused
concentration pipeline, ``analysis/fusedpipeline.py``) must reproduce the
staged lane — ``Image(transformations=...)`` -> ``ImageRegistration`` ->
``ConcentrationAnalysis`` — bit-for-bit up to float tolerance, because it
traces the SAME public objects' stage functions.
"""

import numpy as np
import pytest

import darsia_tpu as da
from darsia_tpu.utils.linear_solvers import Jacobi


def _scene(shape=(96, 128), seed=0):
    """Textured uint8 RGB scene + correction chain + analysis objects."""
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp

    from darsia_tpu.restoration.averaging import uniform_filter

    layers = []
    for c in range(3):
        smooth = np.asarray(
            uniform_filter(jnp.asarray(rng.random(shape, np.float32)), 7)
        )
        smooth = (smooth - smooth.min()) / (smooth.max() - smooth.min())
        layers.append(smooth)
    base_u8 = (np.stack(layers, axis=-1) * 255).astype(np.uint8)

    H, W = shape
    curv = da.CurvatureCorrection(
        config={
            "crop": {
                "pts_src": [[2, 3], [H - 4, 2], [H - 3, W - 3], [2, W - 4]],
                "width": 1.0,
                "height": 1.0,
            },
            "bulge": {"horizontal_bulge": -1e-7, "vertical_bulge": -2e-7},
        }
    )
    trans = da.TranslationCorrection([1.0, -2.0])
    meta = {"width": 1.0, "height": 1.0}
    base_img = da.OpticalImage(
        base_u8, transformations=[trans, curv], **meta
    ).img_as(np.float32)
    analysis = da.ConcentrationAnalysis(
        base=base_img,
        signal_reduction=da.MonochromaticReduction(color="gray"),
        restoration=lambda s: da.H1_regularization(
            s, mu=1.0, omega=0.2, dim=2, solver=Jacobi(maxiter=5)
        ),
        model=da.LinearModel(scaling=2.0),
        **{"diff option": "positive"},
    )
    return base_u8, trans, curv, meta, base_img, analysis


class TestFusedFullPath:
    def test_matches_staged_path(self):
        base_u8, trans, curv, meta, base_img, analysis = _scene()
        probe = np.roll(base_u8, shift=(1, 2), axis=(0, 1))

        reg_staged = da.ImageRegistration(
            base_img, N_patches=[2, 2], rel_overlap=0.2, quality_tol=0.01
        )
        img = da.OpticalImage(probe, transformations=[trans, curv], **meta)
        registered = reg_staged(img.img_as(np.float32))
        staged = np.asarray(analysis(registered).img)

        reg_fused = da.ImageRegistration(
            base_img, N_patches=[2, 2], rel_overlap=0.2, quality_tol=0.01
        )
        pipe = da.FusedAnalysisPipeline(
            transformations=[trans, curv],
            registration=reg_fused,
            analysis=analysis,
        )
        fused = pipe(da.OpticalImage(probe, **meta))
        assert isinstance(fused, da.ScalarImage)
        assert fused.img.shape == staged.shape
        assert np.allclose(np.asarray(fused.img), staged, atol=1e-4)
        # Output geometry is the corrected space.
        assert np.allclose(fused.dimensions, base_img.dimensions)

    def test_raw_array_input_and_displacement_state(self):
        base_u8, trans, curv, meta, base_img, analysis = _scene(seed=3)
        probe = np.roll(base_u8, shift=(2, 1), axis=(0, 1))

        reg = da.ImageRegistration(
            base_img, N_patches=[2, 2], rel_overlap=0.2, quality_tol=0.01
        )
        pipe = da.FusedAnalysisPipeline(
            transformations=[trans, curv], registration=reg, analysis=analysis
        )
        out = pipe(probe)  # raw array: metadata from the analysis baseline
        assert out.img.shape == tuple(base_img.num_voxels[:2])
        # The registration object's introspection stays live (lazily
        # materialized from the staged device shifts, no eager host sync).
        disp = reg.displacement()
        assert disp.shape == (2, *base_img.num_voxels[:2])
        assert np.isfinite(disp).all()

    def test_correction_only_pipeline(self):
        base_u8, trans, curv, meta, base_img, analysis = _scene(seed=5)
        probe = np.roll(base_u8, shift=(1, 1), axis=(0, 1))

        pipe = da.FusedAnalysisPipeline(
            transformations=[trans, curv], analysis=analysis
        )
        fused = np.asarray(pipe(da.OpticalImage(probe, **meta)).img)
        staged_img = da.OpticalImage(
            probe, transformations=[trans, curv], **meta
        )
        staged = np.asarray(analysis(staged_img.img_as(np.float32)).img)
        assert np.allclose(fused, staged, atol=1e-4)

    def test_series_matches_per_frame(self):
        base_u8, trans, curv, meta, base_img, analysis = _scene(seed=7)
        T = 3
        series = np.stack(
            [
                np.roll(base_u8, shift=(1 + k, 2), axis=(0, 1))
                for k in range(T)
            ],
            axis=2,
        )  # (H, W, T, C)

        reg = da.ImageRegistration(
            base_img, N_patches=[2, 2], rel_overlap=0.2, quality_tol=0.01
        )
        pipe = da.FusedAnalysisPipeline(
            transformations=[trans, curv], registration=reg, analysis=analysis
        )
        out = pipe(da.OpticalImage(series, series=True, **meta))
        assert out.series
        arr = np.asarray(out.img)
        assert arr.shape[-1] == T

        for k in range(T):
            single = np.asarray(
                pipe(da.OpticalImage(series[:, :, k], **meta)).img
            )
            # The vmapped series program may flip isolated round-to-uint8
            # decisions at the correction stage (f32 batching
            # reassociation); one flip is 1/255 * gray * model = 4.6e-3 at
            # the flipped pixel.  Gate the bulk tightly and allow a handful
            # of quantization flips.
            d = np.abs(arr[..., k] - single)
            assert float(d.mean()) <= 1e-5
            # a flip + its smoothing neighborhood ~ tens of pixels
            assert float((d > 1e-3).mean()) <= 5e-3
            assert float(d.max()) <= 8e-3

    def test_single_warp_lane(self):
        """single_warp=True: correct+register in ONE gather, same alignment.

        The composed lane differs from the classic fused lane by exactly
        one interpolation pass (docs/roofline.md lever 1), so outputs agree
        to interpolation tolerance AND — the actual fidelity criterion —
        the single-warp registered frame is as close to the base as the
        two-warp one.
        """
        base_u8, trans, curv, meta, base_img, analysis = _scene()
        probe = np.roll(base_u8, shift=(1, 2), axis=(0, 1))

        def make_reg():
            return da.ImageRegistration(
                base_img, N_patches=[2, 2], rel_overlap=0.2, quality_tol=0.01
            )

        pipe_ref = da.FusedAnalysisPipeline(
            transformations=[trans, curv], registration=make_reg()
        )
        pipe_1w = da.FusedAnalysisPipeline(
            transformations=[trans, curv],
            registration=make_reg(),
            single_warp=True,
        )
        out_ref = np.asarray(pipe_ref(da.OpticalImage(probe, **meta)).img)
        out_1w = np.asarray(pipe_1w(da.OpticalImage(probe, **meta)).img)
        assert out_ref.shape == out_1w.shape
        inner = (slice(6, -6), slice(6, -6))
        # Interpolation-level agreement (measured mean 1.0e-2 on this
        # high-frequency random texture; real lab imagery is far smoother).
        assert np.abs(out_ref[inner] - out_1w[inner]).mean() < 3e-2
        # Alignment fidelity: one interpolation pass cannot align WORSE.
        base_arr = np.asarray(base_img.img)
        resid_ref = np.abs(out_ref[inner] - base_arr[inner]).mean()
        resid_1w = np.abs(out_1w[inner] - base_arr[inner]).mean()
        assert resid_1w < 1.2 * resid_ref + 1e-3

        # Full path with concentration analysis agrees at signal level.
        pipe_ref_c = da.FusedAnalysisPipeline(
            transformations=[trans, curv],
            registration=make_reg(),
            analysis=analysis,
        )
        pipe_1w_c = da.FusedAnalysisPipeline(
            transformations=[trans, curv],
            registration=make_reg(),
            analysis=analysis,
            single_warp=True,
        )
        conc_ref = np.asarray(pipe_ref_c(da.OpticalImage(probe, **meta)).img)
        conc_1w = np.asarray(pipe_1w_c(da.OpticalImage(probe, **meta)).img)
        assert np.abs(conc_ref[inner] - conc_1w[inner]).mean() < 1.5e-2

        # Series lane reproduces the per-frame program.
        T = 3
        series = np.stack(
            [np.roll(base_u8, shift=(1 + k, 2), axis=(0, 1)) for k in range(T)],
            axis=2,
        )
        arr = np.asarray(
            pipe_1w_c(da.OpticalImage(series, series=True, **meta)).img
        )
        single0 = np.asarray(
            pipe_1w_c(da.OpticalImage(series[:, :, 0], **meta)).img
        )
        assert np.abs(arr[..., 0] - single0).mean() < 1e-5

    def test_single_warp_requires_registration_and_chain(self):
        base_u8, trans, curv, meta, base_img, analysis = _scene(seed=11)
        probe = np.roll(base_u8, shift=(1, 1), axis=(0, 1))
        pipe = da.FusedAnalysisPipeline(
            transformations=[trans, curv], single_warp=True
        )
        with pytest.raises(ValueError, match="single_warp"):
            pipe(da.OpticalImage(probe, **meta))

    def test_retraces_on_model_update(self):
        base_u8, trans, curv, meta, base_img, analysis = _scene(seed=9)
        probe = np.roll(base_u8, shift=(1, 2), axis=(0, 1))
        pipe = da.FusedAnalysisPipeline(
            transformations=[trans, curv], analysis=analysis
        )
        first = np.asarray(pipe(da.OpticalImage(probe, **meta)).img)
        analysis.model.update_model_parameters(np.array([4.0, 0.0]))
        second = np.asarray(pipe(da.OpticalImage(probe, **meta)).img)
        assert np.allclose(second, 2.0 * first, atol=1e-5)
