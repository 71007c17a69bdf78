"""Comparison workflow steps (parity: reference
``presets/workflows/comparison/``)."""

from .comparison_events import comparison_events
from .comparison_wasserstein import (
    WassersteinDistanceResult,
    comparison_wasserstein,
)
