"""Fidelity: contour extraction and smoothing strategies vs the reference
(reference single_image_analysis/contour{analysis,_smoother}.py).
"""

import numpy as np
import pytest

import darsia_tpu as dt


def _blob_mask(n=64, seed=90):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n), indexing="ij")
    r = np.sqrt(yy**2 + xx**2)
    wobble = 0.15 * np.sin(5 * np.arctan2(yy, xx))
    return (r < 0.6 + wobble).astype(bool)


def _as_xy(contour):
    return np.asarray(contour).reshape(-1, 2).astype(float)


def _load_analysis(module, mask):
    meta = {"width": 1.0, "height": 1.0, "scalar": True}
    img = module.Image(mask.astype(float), **meta)
    mask_img = module.Image(mask.copy(), **meta)
    analysis = module.ContourAnalysis()
    analysis.load(img, mask_img)
    return analysis


class TestContourExtractionFidelity:
    def test_contours_and_length(self, ref):
        mask = _blob_mask()
        r_ana = _load_analysis(ref, mask)
        o_ana = _load_analysis(dt, mask)
        r_contours = r_ana.contours()
        o_contours = o_ana.contours()
        assert len(r_contours) >= 1 and len(o_contours) >= 1
        # The largest contour has the same number of boundary points (both
        # use cv2.findContours CHAIN_APPROX_NONE semantics).
        r_main = max(r_contours, key=lambda c: _as_xy(c).shape[0])
        o_main = max(o_contours, key=lambda c: _as_xy(c).shape[0])
        assert abs(_as_xy(r_main).shape[0] - _as_xy(o_main).shape[0]) <= 2
        # Same point set (cyclic order may differ in starting point).
        r_set = {tuple(p) for p in _as_xy(r_main).astype(int)}
        o_set = {tuple(p) for p in _as_xy(o_main).astype(int)}
        overlap = len(r_set & o_set) / max(len(r_set), 1)
        assert overlap > 0.95


class TestContourSmootherFidelity:
    def _main_contour(self, module, mask):
        contours = _load_analysis(module, mask).contours()
        return max(contours, key=lambda c: _as_xy(c).shape[0])

    @pytest.mark.parametrize(
        "name,kwargs",
        [
            ("PolyDPSmoother", {"epsilon": 0.01, "use_ratio": True}),
            ("MovingAverageSmoother", {"window": 7}),
            ("GaussianSmoother", {"sigma": 2.0}),
            ("SavitzkyGolaySmoother", {"window_length": 9, "polyorder": 2}),
        ],
    )
    def test_smoother_strategies(self, ref, name, kwargs):
        mask = _blob_mask()
        r_contour = self._main_contour(ref, mask)
        o_contour = self._main_contour(dt, mask)
        try:
            r_smoother = getattr(ref, name)(**kwargs)
        except TypeError:
            pytest.skip(f"reference {name} has different tuning kwargs")
        o_smoother = getattr(dt, name)(**kwargs)
        r_out = _as_xy(r_smoother(r_contour))
        o_out = _as_xy(o_smoother(o_contour))
        # Strategies must contract noise comparably: similar point counts
        # and every smoothed reference point near some smoothed ours point.
        assert r_out.shape[0] > 3 and o_out.shape[0] > 3
        from scipy.spatial import cKDTree

        dist, _ = cKDTree(o_out).query(r_out)
        assert np.median(dist) < 3.0, (name, np.median(dist))
