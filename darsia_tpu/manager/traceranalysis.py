"""Tracer analysis manager.

Parity: reference ``src/darsia/manager/traceranalysis.py``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from pathlib import Path
from typing import Union

from ..analysis.concentrationanalysis import ConcentrationAnalysis
from .concentrationanalysisbase import ConcentrationAnalysisBase

__all__ = ["TracerAnalysis"]


class TracerAnalysis(ABC, ConcentrationAnalysisBase):
    """Abstract tracer analysis driver: define_tracer_analysis() to use."""

    def __init__(
        self,
        baseline,
        config: Union[str, Path],
        update_setup: bool = False,
    ) -> None:
        super().__init__(baseline, config, update_setup)
        if "tracer" not in self.config:
            raise ValueError("Tracer analysis not well defined.")
        self.tracer_analysis = self.define_tracer_analysis()
        if not isinstance(self.tracer_analysis, ConcentrationAnalysis):
            raise ValueError("tracer_analysis has wrong type.")
        tracer_config = self.config.get("tracer", {})
        cleaning_filter = tracer_config.get(
            "cleaning_filter", "cache/cleaning_filter_tracer.npy"
        )
        self._setup_concentration_analysis(
            self.tracer_analysis, cleaning_filter, baseline, update_setup
        )

    @abstractmethod
    def define_tracer_analysis(self) -> ConcentrationAnalysis:
        """Define the tracer concentration analysis (problem specific)."""

    def determine_tracer(self, return_volume: bool = False):
        """Tracer concentration of the currently loaded image."""
        concentration = self.tracer_analysis(self.img)
        if return_volume:
            from ..measure.integration import Geometry

            geometry = Geometry(**concentration.shape_metadata())
            return concentration, float(geometry.integrate(concentration))
        return concentration

    def single_image_analysis(self, img, **kwargs):
        """Load image and determine tracer concentration."""
        self.load_and_process_image(img)
        return self.determine_tracer(**kwargs)
