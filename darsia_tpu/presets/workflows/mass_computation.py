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

    def compute_total_mass(self, img) -> float:
        """Total mass of a signal image (reference
        mass_computation.py:441-453: run the chain, integrate the mass
        field over the geometry)."""
        return self.integrated_mass(img)

    def calibration(self, calibration_data: dict) -> None:
        """Per-label linear rescaling from target/current means (reference
        mass_computation.py:455-462)."""
        if not hasattr(self, "transformations"):
            self.transformations: dict = {}
        for label, data in calibration_data.items():
            target_mean = data["target_mean"]
            current_mean = data["current_mean"]
            scale = target_mean / current_mean if current_mean != 0 else 1.0
            self.transformations[label] = lambda x, s=scale: x * s

    def load(self, path) -> None:
        """Load the fitted PW transformation (reference
        mass_computation.py:464-465)."""
        self.transformation = PWTransformation.load(path)

    def save(self, path) -> None:
        """Persist the fitted PW transformation (reference
        mass_computation.py:467-468)."""
        self.transformation.save(path)

    def show(self) -> None:  # pragma: no cover - visual
        """Plot the signal->mass transformation curve (reference
        mass_computation.py:470-472 leaves this unimplemented; here the
        PW nodes are rendered)."""
        import matplotlib.pyplot as plt

        supports = np.asarray(self.transformation.supports)
        values = np.asarray(self.transformation.values)
        plt.figure("MassComputation transformation")
        plt.plot(supports, values, "o-")
        plt.xlabel("signal")
        plt.ylabel("transformed signal")
        plt.show()
