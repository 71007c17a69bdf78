"""Analysis presets (parity: reference ``presets/analysis/``)."""

from .multichromatictracer import MultichromaticTracerAnalysis
from .porosity import PorosityAnalysis, patched_porosity_analysis
