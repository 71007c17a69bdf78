"""Benchmark CO2 concentration-analysis presets.

Parity: reference ``presets/fluidflower/benchmarkco2model.py:12-118``.
"""

from __future__ import annotations

import numpy as np

from ...analysis.concentrationanalysis import (
    PriorPosteriorConcentrationAnalysis,
)
from ...restoration.binaryinpaint import BinaryFillHoles, BinaryRemoveSmallObjects
from ...restoration.resize import Resize
from ...restoration.tvd import TVD
from ...signals.models.binarydataselector import BinaryDataSelector
from ...signals.models.combinedmodel import CombinedModel
from ...signals.models.staticthresholdmodel import StaticThresholdModel
from ...signals.models.thresholdmodel import ThresholdModel
from ...signals.reduction.signalreduction import MonochromaticReduction

__all__ = [
    "benchmark_binary_cleaning_preset",
    "benchmark_concentration_analysis_preset",
]


def benchmark_binary_cleaning_preset(base, options: dict) -> CombinedModel:
    """Binary inpainting -> coarsen+TVD smoothing -> re-threshold
    (reference benchmarkco2model.py:12-49)."""
    original_shape = np.asarray(base.img).shape[:2]
    return CombinedModel(
        [
            BinaryRemoveSmallObjects(key="prior ", **options),
            BinaryFillHoles(key="prior ", **options),
            Resize(dtype=np.float32, key="prior ", **options),
            TVD(key="prior ", **options),
            Resize(shape=original_shape),
            StaticThresholdModel(0.5),
        ]
    )


def benchmark_concentration_analysis_preset(
    base, labels: np.ndarray, options: dict
) -> PriorPosteriorConcentrationAnalysis:
    """Monochromatic reduction -> restoration -> threshold prior ->
    posterior review (reference benchmarkco2model.py:52-118)."""
    signal_reduction = MonochromaticReduction(**options)
    balancing = None
    original_shape = np.asarray(base.img).shape[:2]
    restoration = CombinedModel(
        [
            Resize(key="restoration ", **options),
            TVD(key="restoration ", **options),
            Resize(shape=original_shape),
        ]
    )
    prior_model = CombinedModel(
        [
            ThresholdModel(labels, key="prior ", **options),
            benchmark_binary_cleaning_preset(base, options),
        ]
    )
    posterior_model = BinaryDataSelector(key="posterior ", **options)
    return PriorPosteriorConcentrationAnalysis(
        base,
        signal_reduction,
        balancing,
        restoration,
        prior_model,
        posterior_model,
        labels,
        **options,
    )
