"""TPU-native kernel correctness: color conversions vs OpenCV, FFT phase
correlation properties, warp engines vs scipy, resize modes vs cv2.

These pin the XLA kernels against the native implementations the reference
delegates to (SURVEY §2.11: cv2.cvtColor, cv2.resize, phase correlation
replacing ORB, scipy map_coordinates)."""

import numpy as np
import pytest

import darsia_tpu as da


def _rgb(seed=0, shape=(32, 48, 3)):
    return np.random.default_rng(seed).random(shape).astype(np.float32)


class TestColorConversionsVsOpenCV:
    @pytest.mark.parametrize("space", ["HSV", "LAB", "HLS", "BGR"])
    def test_matches_cv2(self, space):
        import cv2

        from darsia_tpu.ops.color import convert_trichromatic

        rgb = _rgb()
        ours = np.asarray(convert_trichromatic(rgb, "RGB", space))
        code = getattr(cv2, f"COLOR_RGB2{space}")
        theirs = cv2.cvtColor(rgb, code)
        if space == "HSV" or space == "HLS":
            # Hue is periodic (360): compare modulo.
            dh = np.abs(ours[..., 0] - theirs[..., 0])
            dh = np.minimum(dh, 360.0 - dh)
            assert dh.max() < 0.5
            np.testing.assert_allclose(
                ours[..., 1:], theirs[..., 1:], atol=5e-3
            )
        else:
            np.testing.assert_allclose(ours, theirs, atol=0.5 if space == "LAB" else 1e-5)

    def test_roundtrip_rgb_hsv_rgb(self):
        from darsia_tpu.ops.color import convert_trichromatic

        rgb = _rgb(1)
        back = np.asarray(
            convert_trichromatic(
                convert_trichromatic(rgb, "RGB", "HSV"), "HSV", "RGB"
            )
        )
        np.testing.assert_allclose(back, rgb, atol=1e-4)

    def test_gray_matches_cv2(self):
        import cv2

        from darsia_tpu.ops.color import rgb_to_gray

        rgb = _rgb(2)
        ours = np.asarray(rgb_to_gray(rgb))
        theirs = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestPhaseCorrelation:
    def test_recovers_integer_and_subpixel_shifts(self):
        from darsia_tpu.ops.fft import (
            phase_correlation_prepared,
            prepare_phase_reference,
        )
        from scipy import ndimage

        rng = np.random.default_rng(3)
        base = ndimage.uniform_filter(rng.random((128, 128)), 5).astype(
            np.float32
        )
        ref = prepare_phase_reference(base)
        for shift in [(3.0, -5.0), (0.5, 1.25), (-7.75, 2.5)]:
            moved = ndimage.shift(base, shift, order=3, mode="wrap").astype(
                np.float32
            )
            est, quality = phase_correlation_prepared(ref, moved, (128, 128))
            est = np.asarray(est)
            # Convention: the estimate is the shift that ALIGNS moved back
            # onto the reference (negative of the applied displacement) —
            # the registration pipeline warps by -est (bench.py).
            np.testing.assert_allclose(-est, shift, atol=0.25)
            assert float(quality) > 0.05

    def test_quality_low_for_unrelated_images(self):
        from darsia_tpu.ops.fft import (
            phase_correlation_prepared,
            prepare_phase_reference,
        )

        rng = np.random.default_rng(4)
        a = rng.random((64, 64)).astype(np.float32)
        b = rng.random((64, 64)).astype(np.float32)
        ref = prepare_phase_reference(a)
        _, q_unrelated = phase_correlation_prepared(ref, b, (64, 64))
        _, q_self = phase_correlation_prepared(ref, a, (64, 64))
        assert float(q_self) > 2 * float(q_unrelated)


class TestWarpVsScipy:
    def test_xla_warp_matches_map_coordinates(self):
        from scipy import ndimage

        from darsia_tpu.ops.warp import identity_grid, warp

        rng = np.random.default_rng(5)
        img = rng.random((40, 56)).astype(np.float32)
        yy, xx = np.meshgrid(np.arange(40), np.arange(56), indexing="ij")
        coords = np.stack(
            [
                yy + 2.0 * np.sin(xx / 9.0),
                xx + 1.5 * np.cos(yy / 7.0),
            ]
        ).astype(np.float32)
        ours = np.asarray(warp(img, coords, order=1, mode="nearest"))
        theirs = ndimage.map_coordinates(
            img, coords, order=1, mode="nearest"
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestResizeVsOpenCV:
    @pytest.mark.parametrize(
        "interp", ["inter_nearest", "inter_linear", "inter_area"]
    )
    def test_matches_cv2(self, interp):
        import cv2

        from darsia_tpu.ops.resize import resize_array

        rng = np.random.default_rng(6)
        img = rng.random((32, 48)).astype(np.float32)
        ours = np.asarray(resize_array(img, (16, 24), interp))
        if interp == "inter_nearest":
            # Pixel-center conventions differ at exact 2x ties; require
            # every output value to come from its 2x2 source block.
            blocks = img.reshape(16, 2, 24, 2).transpose(0, 2, 1, 3)
            member = np.isclose(
                ours[..., None, None], blocks, atol=1e-6
            ).any(axis=(-2, -1))
            assert member.all()
        else:
            code = {
                "inter_linear": cv2.INTER_LINEAR,
                "inter_area": cv2.INTER_AREA,
            }[interp]
            theirs = cv2.resize(img, (24, 16), interpolation=code)
            np.testing.assert_allclose(ours, theirs, atol=2e-2)


class TestTVKernels:
    def test_chambolle_tvd_denoises(self):
        import jax.numpy as jnp

        from darsia_tpu.ops.tv import chambolle_tvd

        rng = np.random.default_rng(8)
        clean = np.zeros((32, 32), np.float32)
        clean[:, 16:] = 1.0
        noisy = clean + rng.normal(0, 0.2, clean.shape).astype(np.float32)
        out = np.asarray(chambolle_tvd(jnp.asarray(noisy), weight=0.15))
        assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean()

    def test_tv_energy_decreases(self):
        import jax.numpy as jnp

        from darsia_tpu.restoration.split_bregman_tvd import split_bregman_tvd

        rng = np.random.default_rng(7)
        clean = np.zeros((32, 32), np.float32)
        clean[:, 16:] = 1.0
        noisy = clean + rng.normal(0, 0.2, clean.shape).astype(np.float32)
        out = np.asarray(
            split_bregman_tvd(jnp.asarray(noisy), mu=0.2, max_num_iter=30)
        )

        def tv(u):
            return np.abs(np.diff(u, axis=0)).sum() + np.abs(
                np.diff(u, axis=1)
            ).sum()

        assert tv(out) < 0.5 * tv(noisy)
        assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean()
