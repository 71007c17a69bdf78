"""Application-layer presets (parity: reference ``presets/``)."""

from .analysis import (
    MultichromaticTracerAnalysis,
    PorosityAnalysis,
    patched_porosity_analysis,
)
from .workflows import FaciesProps, Rig
