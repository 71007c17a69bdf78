"""Mass computation: signal transformation + flash + mass analysis with
injected-mass calibration.

Parity: reference ``presets/workflows/mass_computation.py:43-260``.
The interactive value tuning becomes a scipy least-squares fit of the
monotone PW transformation against the injection protocol.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from ...signals.models.pwtransformation import PWTransformation
from .simple_run_analysis import SimpleRunAnalysis

logger = logging.getLogger(__name__)

__all__ = ["MassComputation"]


class MassComputation:
    """Transform a scalar signal into CO2 mass via flash + mass analysis."""

    def __init__(self, baseline, geometry, flash, co2_mass_analysis) -> None:
        self.baseline = baseline
        self.geometry = geometry
        self.flash = flash
        self.co2_mass_analysis = co2_mass_analysis
        self.transformation = PWTransformation(
            supports=[-1, 0, 0.1, 0.25]
            + np.linspace(0.5, 1.0, 11).tolist()
            + [10.0],
            values=[0, 0, 0.1, 0.25] + np.linspace(0.5, 2, 11).tolist() + [2],
        )

    def __call__(self, signal):
        """Signal image -> MassAnalysisResults."""
        transformed = self.transformation(signal)
        c_aq, s_g = self.flash(transformed)
        return self.co2_mass_analysis.mass_analysis(c_aq=c_aq, s_g=s_g)

    def integrated_mass(self, signal) -> float:
        return float(self.geometry.integrate(self(signal).mass))

    def fit(
        self,
        untransformed_images: list,
        experiment,
        maxiter: int = 200,
    ) -> None:
        """Fit the transformation values to match the injected mass at the
        image times (reference :60-220; Powell search over monotone
        increments)."""
        from scipy.optimize import minimize

        expected = [
            float(
                experiment.injection_protocol.injected_mass(date=img.date)
            )
            for img in untransformed_images
        ]
        values0 = np.asarray(self.transformation.values, dtype=float)
        diffs0 = np.diff(values0)

        def install(diffs):
            values = np.concatenate([[values0[0]], np.abs(diffs)]).cumsum()
            self.transformation.update(values=values)

        def objective(diffs):
            install(diffs)
            error = 0.0
            for img, mass_expected in zip(untransformed_images, expected):
                detected = self.integrated_mass(img)
                error += (detected - mass_expected) ** 2
            return error

        result = minimize(
            objective,
            diffs0,
            method="Powell",
            options={"maxiter": maxiter, "ftol": 1e-12},
        )
        install(result.x)
        logger.info("MassComputation fit finished: %s", result.message)

    def track(self, images: list) -> SimpleRunAnalysis:
        """Run the analysis over a series and return the tracker."""
        analysis = SimpleRunAnalysis(self.geometry)
        for img in images:
            analysis.append(self(img), name=getattr(img, "name", ""))
        return analysis
