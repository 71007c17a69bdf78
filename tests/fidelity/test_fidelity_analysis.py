"""Fidelity: analysis/experiment layers vs the reference CPU implementation.

Translation estimation (ORB/RANSAC vs FFT phase correlation), drift
correction, image arithmetics, signal models, flash thermodynamics,
segmentation comparison, and CSV experiment protocols.
"""

from datetime import datetime, timedelta

import numpy as np
import pytest

import darsia_tpu as dt


def _textured_image(shape=(120, 160), seed=31):
    """Feature-rich test pattern (ORB needs corners)."""
    rng = np.random.default_rng(seed)
    img = rng.random(shape) * 0.2
    for _ in range(40):
        r, c = rng.integers(10, shape[0] - 20), rng.integers(10, shape[1] - 20)
        img[r : r + rng.integers(4, 12), c : c + rng.integers(4, 12)] += rng.random()
    img = np.clip(img, 0, 1)
    return np.stack([img, 0.8 * img, 0.6 * img], axis=-1).astype(np.float32)


class TestTranslationFidelity:
    @pytest.mark.parametrize("shift", [(4, 7), (-6, 3)])
    def test_translation_estimators_agree(self, ref, shift):
        """ORB+RANSAC (reference) and FFT phase correlation (ours) must
        recover the same integer shift (SURVEY §2.11: deliberate
        jittable redesign with equivalent estimates)."""
        base = _textured_image()
        moved = np.roll(base, shift, axis=(0, 1))
        r_est = ref.TranslationEstimator()
        o_est = dt.TranslationEstimator()
        moved_u8 = (moved * 255).astype(np.uint8)
        base_u8 = (base * 255).astype(np.uint8)
        r_disp = r_est.find_effective_translation(moved_u8, base_u8)
        o_disp = o_est.find_effective_translation(moved_u8, base_u8)
        # Both return affine-like (2,3) matrices or displacement tuples;
        # extract the translation component generically.
        def translation_of(result):
            # Estimators return (affine_2x3, success) or a bare matrix.
            if isinstance(result, tuple):
                matrix, success = result
                assert success
            else:
                matrix = result
            arr = np.asarray(matrix)
            if arr.shape == (2, 3):
                return arr[:, 2]
            return arr.reshape(-1)[:2]

        r_t = translation_of(r_disp)
        o_t = translation_of(o_disp)
        assert np.allclose(r_t, o_t, atol=1.0), (r_t, o_t)
        # And the true shift is recovered: (x, y) translation mapping
        # moved -> base is (-shift[1], -shift[0]).
        assert np.allclose(r_t, [-shift[1], -shift[0]], atol=1.0)

    def test_drift_correction_matches(self, ref, shift=(5, -3)):
        base = _textured_image(seed=32)
        moved = np.roll(base, shift, axis=(0, 1))
        meta = {"width": 1.6, "height": 1.2}
        r_base = ref.Image(base.copy(), **meta)
        o_base = dt.Image(base.copy(), **meta)
        r_img = ref.Image(moved.copy(), **meta)
        o_img = dt.Image(moved.copy(), **meta)
        r_corr = ref.DriftCorrection(base=r_base)
        o_corr = dt.DriftCorrection(base=o_base)
        r_out = np.asarray(r_corr(r_img).img)
        o_out = np.asarray(o_corr(o_img).img)
        # Interior must be de-drifted identically (borders differ by
        # extrapolation policy).
        # ours warps at the subpixel phase-correlation estimate, so allow
        # bilinear-interpolation noise around the exact integer shift.
        sl = (slice(10, -10), slice(10, -10))
        assert np.abs(r_out[sl] - base[sl]).max() < 1e-3
        assert np.abs(o_out[sl] - base[sl]).max() < 5e-3
        assert np.abs(r_out[sl] - o_out[sl]).max() < 5e-3


class TestArithmeticsFidelity:
    META = {"width": 1.0, "height": 1.0, "scalar": True}

    def test_weight_and_dunders(self, ref):
        rng = np.random.default_rng(33)
        a = rng.random((12, 14))
        b = rng.random((12, 14))
        r_a, o_a = ref.Image(a.copy(), **self.META), dt.Image(a.copy(), **self.META)
        r_b, o_b = ref.Image(b.copy(), **self.META), dt.Image(b.copy(), **self.META)
        assert np.allclose(
            np.asarray(ref.weight(r_a, 2.5).img), np.asarray(dt.weight(o_a, 2.5).img)
        )
        assert np.allclose(
            np.asarray((r_a + r_b).img), np.asarray((o_a + o_b).img)
        )
        assert np.allclose(
            np.asarray((r_a - r_b).img), np.asarray((o_a - o_b).img)
        )
        assert np.allclose(
            np.asarray((2.0 * r_a).img), np.asarray((2.0 * o_a).img)
        )

    def test_superpose(self, ref):
        rng = np.random.default_rng(34)
        a = rng.random((10, 10))
        b = rng.random((10, 10))
        meta_a = {"width": 1.0, "height": 1.0, "origin": [0.0, 1.0], "scalar": True}
        meta_b = {"width": 1.0, "height": 1.0, "origin": [0.5, 1.5], "scalar": True}
        r_sup = ref.superpose(
            [ref.Image(a.copy(), **meta_a), ref.Image(b.copy(), **meta_b)]
        )
        o_sup = dt.superpose(
            [dt.Image(a.copy(), **meta_a), dt.Image(b.copy(), **meta_b)]
        )
        assert r_sup.img.shape == o_sup.img.shape
        assert np.allclose(np.asarray(r_sup.img), np.asarray(o_sup.img), atol=1e-10)

    def test_stack_and_time_slicing(self, ref):
        rng = np.random.default_rng(35)
        frames = [rng.random((8, 9)) for _ in range(3)]
        r_imgs = [ref.Image(f.copy(), **self.META) for f in frames]
        o_imgs = [dt.Image(f.copy(), **self.META) for f in frames]
        r_series = ref.stack(r_imgs)
        o_series = dt.stack(o_imgs)
        assert r_series.img.shape == o_series.img.shape
        r_slice = r_series.time_slice(1)
        o_slice = o_series.time_slice(1)
        assert np.allclose(np.asarray(r_slice.img), np.asarray(o_slice.img))


class TestModelFidelity:
    def test_linear_and_clip(self, ref):
        rng = np.random.default_rng(36)
        signal = rng.standard_normal((15, 17))
        r_lin = ref.LinearModel(scaling=1.7, offset=0.25)
        o_lin = dt.LinearModel(scaling=1.7, offset=0.25)
        assert np.allclose(np.asarray(r_lin(signal.copy())), np.asarray(o_lin(signal.copy())))
        r_clip = ref.ClipModel(min_value=0.1, max_value=0.8)
        o_clip = dt.ClipModel(min_value=0.1, max_value=0.8)
        assert np.allclose(
            np.asarray(r_clip(signal.copy())), np.asarray(o_clip(signal.copy()))
        )

    def test_static_threshold_heterogeneous(self, ref):
        rng = np.random.default_rng(37)
        signal = rng.random((20, 20))
        labels = np.zeros((20, 20), dtype=int)
        labels[:, 10:] = 1
        r_model = ref.StaticThresholdModel(
            threshold_lower=[0.3, 0.6], labels=labels.copy()
        )
        o_model = dt.StaticThresholdModel(
            threshold_lower=[0.3, 0.6], labels=labels.copy()
        )
        r_out = np.asarray(r_model(signal.copy()))
        o_out = np.asarray(o_model(signal.copy()))
        assert r_out.dtype == o_out.dtype == np.bool_ or r_out.dtype == o_out.dtype
        assert np.array_equal(r_out, o_out)

    def test_combined_model(self, ref):
        rng = np.random.default_rng(38)
        signal = rng.random((12, 12))
        r_model = ref.CombinedModel(
            [ref.LinearModel(scaling=3.0), ref.ClipModel(min_value=0.2, max_value=2.0)]
        )
        o_model = dt.CombinedModel(
            [dt.LinearModel(scaling=3.0), dt.ClipModel(min_value=0.2, max_value=2.0)]
        )
        assert np.allclose(
            np.asarray(r_model(signal.copy())), np.asarray(o_model(signal.copy()))
        )

    def test_monochromatic_reductions(self, ref):
        rng = np.random.default_rng(39)
        img = rng.random((10, 11, 3))
        for color in ("gray", "red", "green", "blue"):
            r_red = ref.MonochromaticReduction(color=color)
            o_red = dt.MonochromaticReduction(color=color)
            r_out = np.asarray(r_red(img.copy()))
            o_out = np.asarray(o_red(img.copy()))
            assert np.allclose(r_out, o_out, atol=1e-5), color


class TestFlashFidelity:
    def test_simple_flash_partition(self, ref):
        rng = np.random.default_rng(40)
        signal_meta = {"width": 1.0, "height": 1.0, "scalar": True}
        signal = rng.random((16, 16))
        r_flash = ref.SimpleFlash(
            min_value_aq=0.1, max_value_aq=0.5, min_value_g=0.5, max_value_g=0.9
        )
        o_flash = dt.SimpleFlash(
            min_value_aq=0.1, max_value_aq=0.5, min_value_g=0.5, max_value_g=0.9
        )
        r_img = ref.Image(signal.copy(), **signal_meta)
        o_img = dt.Image(signal.copy(), **signal_meta)
        r_sat, r_conc = r_flash(r_img)
        o_sat, o_conc = o_flash(o_img)
        assert np.allclose(np.asarray(r_sat.img), np.asarray(o_sat.img), atol=1e-6)
        assert np.allclose(np.asarray(r_conc.img), np.asarray(o_conc.img), atol=1e-6)


class TestProtocolFidelity:
    def _write_protocols(self, tmp_path):
        start = datetime(2024, 5, 1, 8, 0, 0)
        rows = ["image_id,datetime"]
        for i in range(5):
            rows.append(f"{i},{(start + timedelta(minutes=15 * i)).isoformat()}")
        imaging = tmp_path / "imaging.csv"
        imaging.write_text("\n".join(rows) + "\n")
        return imaging, start

    def test_imaging_protocol_datetimes(self, ref, tmp_path):
        imaging, start = self._write_protocols(tmp_path)
        r_proto = ref.ImagingProtocol(imaging, pad=5)
        o_proto = dt.ImagingProtocol(imaging, pad=5)
        from pathlib import Path

        for i in range(5):
            name = Path(f"DSC{i:05d}.JPG")
            r_dt = r_proto.get_datetime(name)
            o_dt = o_proto.get_datetime(name)
            assert r_dt == o_dt, (name, r_dt, o_dt)


class TestSegmentationComparisonFidelity:
    def test_overlap_maps(self, ref):
        seg_a = np.zeros((20, 20), dtype=bool)
        seg_a[4:12, 4:12] = True
        seg_b = np.zeros((20, 20), dtype=bool)
        seg_b[8:16, 8:16] = True
        meta = {"width": 1.0, "height": 1.0, "scalar": True}
        r_cmp = ref.SegmentationComparison()
        o_cmp = dt.SegmentationComparison()
        r_out = r_cmp(
            ref.Image(seg_a.copy(), **meta), ref.Image(seg_b.copy(), **meta)
        )
        o_out = o_cmp(
            dt.Image(seg_a.copy(), **meta), dt.Image(seg_b.copy(), **meta)
        )
        r_arr = np.asarray(r_out.img if hasattr(r_out, "img") else r_out)
        o_arr = np.asarray(o_out.img if hasattr(o_out, "img") else o_out)
        assert r_arr.shape == o_arr.shape
        # Identical overlap classification (colors may be encodings; compare
        # the induced partition: pairs of pixels classified together).
        r_flat = r_arr.reshape(r_arr.shape[0] * r_arr.shape[1], -1)
        o_flat = o_arr.reshape(o_arr.shape[0] * o_arr.shape[1], -1)
        _, r_codes = np.unique(r_flat, axis=0, return_inverse=True)
        _, o_codes = np.unique(o_flat, axis=0, return_inverse=True)
        # Same grouping structure.
        mapping = {}
        for rc, oc in zip(r_codes, o_codes):
            assert mapping.setdefault(rc, oc) == oc
