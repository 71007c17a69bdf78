"""Correction-related workflow config dataclasses.

Parity: reference ``src/darsia/presets/workflows/config/corrections.py``
(partial; grown alongside the workflow layer).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal
from warnings import warn

__all__ = ["IlluminationCorrectionConfig"]

_SUPPORTED_COLORSPACES = (
    "rgb",
    "rgb-scalar",
    "lab",
    "lab-scalar",
    "hsl",
    "hsl-scalar",
    "gray",
)


@dataclass
class IlluminationCorrectionConfig:
    """Configuration for illumination correction."""

    labels: list = field(default_factory=list)
    """Labels to use for illumination correction."""
    interpolation: Literal["rbf", "quartic", "illumination"] = "illumination"
    """Interpolation method for the scaling field."""
    colorspace: Literal[
        "rgb", "rgb-scalar", "lab", "lab-scalar", "hsl", "hsl-scalar", "gray"
    ] = "hsl-scalar"
    """Color space for the analysis."""
    width: int = 100
    """Sample patch width."""
    num_samples: int = 30
    """Number of sample patches."""
    seed: int = 42
    """Random seed for patch sampling."""
    sigma: float = 100.0
    """Gaussian smoothing sigma for the correction map."""
    outliers: float = 0.1
    """Fraction of outliers to discard."""
    bounds: tuple = (0.5, 2.0)
    """Bounds for the correction factors."""

    def load(self, sec: dict) -> "IlluminationCorrectionConfig":
        """Populate from a (TOML) dict section."""
        for key in (
            "labels",
            "interpolation",
            "width",
            "num_samples",
            "seed",
            "sigma",
            "outliers",
        ):
            if key in sec:
                setattr(self, key, sec[key])
        if "bounds" in sec:
            self.bounds = tuple(sec["bounds"])
        if "colorspace" in sec:
            if sec["colorspace"] not in _SUPPORTED_COLORSPACES:
                warn(f"Unsupported colorspace {sec['colorspace']}.")
            else:
                self.colorspace = sec["colorspace"]
        return self
