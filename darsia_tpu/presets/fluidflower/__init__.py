"""FluidFlower presets (parity: reference ``presets/fluidflower/``)."""

from .benchmarkco2model import (
    benchmark_binary_cleaning_preset,
    benchmark_concentration_analysis_preset,
)
from .fluidflowerrig import FluidFlowerRig
from .fluidflowerco2analysis import FluidFlowerCO2Analysis
from .fluidflowertraceranalysis import (
    FluidFlowerTracerAnalysis,
    TailoredConcentrationAnalysis,
)
from .simplefluidflower import SimpleFluidFlower
