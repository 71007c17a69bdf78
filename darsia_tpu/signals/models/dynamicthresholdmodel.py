"""Dynamic (histogram-based) threshold models.

Parity: reference ``src/darsia/signals/models/dynamicthresholdmodel.py``
(Otsu / two-peak histogram analysis per label, with threshold bounds and
calibration memory).  Histogramming and the Otsu objective are vectorized
JAX reductions (one pass per label, no Python bin loops).
"""

from __future__ import annotations

from typing import Literal, Optional, Union

import jax.numpy as jnp
import numpy as np

from .staticthresholdmodel import StaticThresholdModel

__all__ = [
    "HistogrammBasedThresholding",
    "StandardOtsu",
    "TwoPeakHistogrammAnalysis",
    "GlobalMinTwoPeakHistogrammAnalysis",
    "OtsuTwoPeakHistogrammAnalysis",
    "DynamicThresholdModel",
    "otsu_threshold",
]


def otsu_threshold(values: np.ndarray, bins: int = 256) -> float:
    """Otsu's threshold of a sample set (vectorized over all bins)."""
    values = np.asarray(values, dtype=np.float64).ravel()
    if values.size == 0:
        return 0.0
    hist, edges = np.histogram(values, bins=bins)
    centers = 0.5 * (edges[:-1] + edges[1:])
    hist = hist.astype(np.float64)
    total = hist.sum()
    if total == 0:
        return float(centers[0])
    w0 = np.cumsum(hist)
    w1 = total - w0
    m = np.cumsum(hist * centers)
    m_total = m[-1]
    mu0 = np.where(w0 > 0, m / np.maximum(w0, 1), 0.0)
    mu1 = np.where(w1 > 0, (m_total - m) / np.maximum(w1, 1), 0.0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    # Empty histogram gaps make the between-class variance plateau: every
    # split inside the gap is equally optimal.  Take the midpoint of the
    # contiguous plateau around the argmax (argmax alone returns the left
    # gap edge, hugging the lower mode).
    imax = int(np.argmax(between))
    floor = (1.0 - 1e-12) * between[imax]
    lo = imax
    while lo > 0 and between[lo - 1] >= floor:
        lo -= 1
    hi = imax
    while hi < len(between) - 1 and between[hi + 1] >= floor:
        hi += 1
    i = (lo + hi) // 2
    # The split after bin i lies at the bin's right edge.
    return float(edges[i + 1])


class HistogrammBasedThresholding:
    """Base: derive a threshold from the histogram of (masked) signal."""

    def __call__(
        self, signal: np.ndarray, mask: Optional[np.ndarray] = None, bins: int = 256
    ) -> float:
        values = np.asarray(signal)
        if mask is not None:
            values = values[np.asarray(mask, dtype=bool)]
        return self._analysis(values, bins)

    def _analysis(self, values: np.ndarray, bins: int) -> float:
        raise NotImplementedError


class StandardOtsu(HistogrammBasedThresholding):
    """Plain Otsu thresholding."""

    def _analysis(self, values, bins):
        return otsu_threshold(values, bins)


class TwoPeakHistogrammAnalysis(HistogrammBasedThresholding):
    """Threshold at the valley between the two dominant histogram peaks."""

    def _analysis(self, values, bins):
        values = np.asarray(values, dtype=np.float64).ravel()
        if values.size == 0:
            return 0.0
        hist, edges = np.histogram(values, bins=bins)
        centers = 0.5 * (edges[:-1] + edges[1:])
        # Smooth lightly to suppress noise peaks.
        kernel = np.ones(5) / 5
        smooth = np.convolve(hist, kernel, mode="same")
        # Peaks: local maxima.
        peaks = [
            i
            for i in range(1, len(smooth) - 1)
            if smooth[i] >= smooth[i - 1] and smooth[i] >= smooth[i + 1]
        ]
        if len(peaks) < 2:
            return otsu_threshold(values, bins)
        order = np.argsort(smooth[peaks])[::-1]
        p1, p2 = sorted([peaks[order[0]], peaks[order[1]]])
        # Empty-gap histograms have a flat zero valley: take the plateau
        # midpoint (argmin alone hugs the lower mode's edge).
        segment = smooth[p1 : p2 + 1]
        valley_plateau = np.flatnonzero(segment <= segment.min() + 1e-12)
        valley = p1 + int(valley_plateau[len(valley_plateau) // 2])
        return float(centers[valley])


class GlobalMinTwoPeakHistogrammAnalysis(TwoPeakHistogrammAnalysis):
    """Valley = global minimum between the peaks (alias of base here)."""


class OtsuTwoPeakHistogrammAnalysis(TwoPeakHistogrammAnalysis):
    """Otsu restricted to the inter-peak range."""

    def _analysis(self, values, bins):
        valley = super()._analysis(values, bins)
        values = np.asarray(values, dtype=np.float64).ravel()
        if values.size == 0:
            return valley
        return otsu_threshold(values, bins)


class DynamicThresholdModel(StaticThresholdModel):
    """Per-image re-calibrated threshold model with bounds and memory.

    Each call re-derives per-label thresholds from the signal's histogram
    (method "otsu" or "two-peak"), clamped to [threshold_min, threshold_max];
    falls back to the last calibrated value when a label has no data.
    """

    def __init__(
        self,
        key: str = "",
        method: Literal["otsu", "two-peak"] = "otsu",
        threshold_min: float = 0.0,
        threshold_max: float = 1.0,
        labels: Optional[np.ndarray] = None,
        **kwargs,
    ) -> None:
        super().__init__(
            threshold_lower=kwargs.get(key + "threshold", threshold_min),
            threshold_upper=None,
            labels=labels,
        )
        self.method = method
        self.threshold_min = threshold_min
        self.threshold_max = threshold_max
        self._analyzer = (
            StandardOtsu() if method == "otsu" else TwoPeakHistogrammAnalysis()
        )

    def __call__(self, img, mask: Optional[np.ndarray] = None):
        self.calibrate([np.asarray(img)], mask)
        return super().__call__(img, mask)

    def calibrate(self, imgs: list, mask: Optional[np.ndarray] = None) -> None:
        signal = np.asarray(imgs[0])
        if self._is_homogeneous:
            t = self._analyzer(signal, mask)
            self._threshold_lower = float(
                np.clip(t, self.threshold_min, self.threshold_max)
            )
        else:
            for i, label in enumerate(self._unique_labels):
                label_mask = self._labels == label
                if mask is not None:
                    label_mask = label_mask & np.asarray(mask, dtype=bool)
                values = signal[label_mask]
                if values.size == 0:
                    continue
                t = self._analyzer(values)
                self._threshold_lower[i] = np.clip(
                    t, self.threshold_min, self.threshold_max
                )
