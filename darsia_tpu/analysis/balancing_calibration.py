"""Balancing calibration: continuity across facies boundaries.

Parity: reference
``src/darsia/multi_image_analysis/balancing_calibration.py:22-361``.
The balancing model (per-label scaling) is calibrated so the signal is
continuous across label boundaries; the least-squares minimizer over label
couplings is solved in closed form.
"""

from __future__ import annotations

import abc
from typing import Optional

import numpy as np
from scipy import ndimage

__all__ = [
    "AbstractBalancingCalibration",
    "ContinuityBasedBalancingCalibrationMixin",
]


class AbstractBalancingCalibration:
    """Calibration harness for the balancing model (mixin)."""

    @abc.abstractmethod
    def optimize_balancing(self, images, options: dict) -> np.ndarray:
        ...

    def update_balancing_for_calibration(
        self, parameters: np.ndarray, options: dict
    ) -> None:
        dofs = options.get("balancing_dofs", None)
        self.balancing.update_model_parameters(parameters, dofs)

    def calibrate_balancing(self, images, options: dict) -> bool:
        """Calibrate the balancing model from images."""
        if not isinstance(images, list):
            assert images.series
            series = images.copy()
            images = [series.time_slice(i) for i in range(series.time_num)]
        parameters = self.optimize_balancing(images, options)
        self.update_balancing_for_calibration(parameters, options)
        return True


class ContinuityBasedBalancingCalibrationMixin(AbstractBalancingCalibration):
    """Balance per-label scalings to make the signal continuous across
    facies boundaries."""

    def _boundary_pairs(self, labels: np.ndarray, width: int = 3):
        """For each adjacent label pair, masks of thin strips on each side."""
        unique = np.unique(labels)
        pairs = []
        for i, a in enumerate(unique):
            mask_a = labels == a
            dil_a = ndimage.binary_dilation(mask_a, iterations=width)
            for b in unique[i + 1 :]:
                mask_b = labels == b
                touch = dil_a & mask_b
                if not touch.any():
                    continue
                dil_b = ndimage.binary_dilation(mask_b, iterations=width)
                strip_a = dil_b & mask_a
                strip_b = dil_a & mask_b
                pairs.append((a, b, strip_a, strip_b))
        return unique, pairs

    def optimize_balancing(self, images, options: dict) -> np.ndarray:
        """Closed-form log-least-squares for per-label scalings.

        For each boundary pair (a, b): scaling_a * mean_a = scaling_b *
        mean_b. In log space this is a linear system over log-scalings with
        the gauge log s_0 = 0.
        """
        labels = np.asarray(
            options["labels"].img
            if hasattr(options.get("labels"), "img")
            else options["labels"]
        )
        width = options.get("boundary_width", 3)
        unique, pairs = self._boundary_pairs(labels, width)
        index = {label: i for i, label in enumerate(unique)}
        n = len(unique)

        rows, rhs = [], []
        for img in images:
            signal = self._reduce_signal(self._subtract_background(img))
            signal = np.asarray(signal)
            for a, b, strip_a, strip_b in pairs:
                mean_a = float(signal[strip_a].mean()) if strip_a.any() else 0.0
                mean_b = float(signal[strip_b].mean()) if strip_b.any() else 0.0
                if mean_a <= 1e-12 or mean_b <= 1e-12:
                    continue
                row = np.zeros(n)
                row[index[a]] = 1.0
                row[index[b]] = -1.0
                rows.append(row)
                rhs.append(np.log(mean_b) - np.log(mean_a))
        # Gauge: first label fixed to scaling 1.
        gauge = np.zeros(n)
        gauge[0] = 1.0
        rows.append(gauge)
        rhs.append(0.0)
        A = np.stack(rows)
        b_vec = np.asarray(rhs)
        log_s, *_ = np.linalg.lstsq(A, b_vec, rcond=None)
        return np.exp(log_s)
