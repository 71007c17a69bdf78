"""FluidFlower tracer analysis preset.

Parity: reference ``presets/fluidflower/fluidflowertraceranalysis.py:18-190``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np

from ...analysis.balancing_calibration import (
    ContinuityBasedBalancingCalibrationMixin,
)
from ...analysis.concentrationanalysis import ConcentrationAnalysis
from ...analysis.model_calibration import InjectionRateModelObjectiveMixin
from ...manager.traceranalysis import TracerAnalysis
from ...restoration.resize import Resize
from ...restoration.tvd import TVD
from ...signals.models.clipmodel import ClipModel
from ...signals.models.combinedmodel import CombinedModel
from ...signals.models.linearmodel import HeterogeneousLinearModel, LinearModel
from ...signals.reduction.signalreduction import MonochromaticReduction

__all__ = ["FluidFlowerTracerAnalysis", "TailoredConcentrationAnalysis"]


class TailoredConcentrationAnalysis(
    ConcentrationAnalysis,
    ContinuityBasedBalancingCalibrationMixin,
    InjectionRateModelObjectiveMixin,
):
    """Concentration analysis with balancing + injection-rate calibration."""


class FluidFlowerTracerAnalysis(TracerAnalysis):
    """Tracer analysis preset for FluidFlower rigs."""

    def __init__(
        self,
        baseline,
        config: Union[str, Path],
        results: Union[str, Path],
        update_setup: bool = False,
        verbosity: int = 0,
    ) -> None:
        super().__init__(baseline, config, update_setup)
        if not hasattr(self, "labels"):
            self.labels = np.ones(np.asarray(self.base.img).shape[:2], dtype=int)
        self.path_to_results = Path(results)
        self.path_to_results.parent.mkdir(parents=True, exist_ok=True)
        self.verbosity = verbosity

    def define_tracer_analysis(self) -> ConcentrationAnalysis:
        """Grayscale-reduction tracer detection
        (reference fluidflowertraceranalysis.py:62-123)."""
        options = self.config["tracer"]
        if not hasattr(self, "labels"):
            self.labels = np.ones(np.asarray(self.base.img).shape[:2], dtype=int)
        signal_reduction = MonochromaticReduction(**options)
        balancing = HeterogeneousLinearModel(
            self.labels, key="balancing ", **options
        )
        original_shape = np.asarray(self.base.img).shape[:2]
        restoration = CombinedModel(
            [
                Resize(key="restoration ", **options),
                TVD(key="restoration ", **options),
                Resize(shape=original_shape),
            ]
        )
        model = CombinedModel(
            [
                LinearModel(key="model ", **options),
                ClipModel(min_value=0.0, max_value=1.0),
            ]
        )
        return TailoredConcentrationAnalysis(
            self.base,
            signal_reduction,
            balancing,
            restoration,
            model,
            self.labels,
            verbosity=options.get("verbosity", 0),
        )

    def calibrate_balancing(self, calibration_images: list, options: dict) -> None:
        images = [self._read(path) for path in calibration_images]
        self.tracer_analysis.calibrate_balancing(images, options)

    def calibrate_model(self, calibration_images: list, options: dict) -> None:
        images = [self._read(path) for path in calibration_images]
        self.tracer_analysis.calibrate_model(
            images,
            options=dict(
                options, **{"model_position": 0, "geometry": self.geometry}
            ),
        )

    def single_image_analysis(self, img, **kwargs):
        """Tracer concentration for a single image."""
        if hasattr(img, "img"):
            self.img = img.copy()
        else:
            self.load_and_process_image(img)
        return self.determine_tracer()
