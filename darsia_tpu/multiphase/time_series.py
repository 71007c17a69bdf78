"""Time-series tracking of multiphase mass results.

Parity: reference
``src/darsia/multiphase/multiphase_time_series_{data,analysis}.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

from ..measure.integration import Geometry
from .mass_analysis import MassAnalysisResults

__all__ = ["TimeSeriesData", "MultiphaseTimeSeriesData", "MultiphaseTimeSeriesAnalysis"]


@dataclass
class TimeSeriesData:
    """Base container of time stamps."""

    times: list = field(default_factory=list)


@dataclass
class MultiphaseTimeSeriesData(TimeSeriesData):
    """Integrated multiphase quantities over time."""

    mass: list = field(default_factory=list)
    mass_g: list = field(default_factory=list)
    mass_aq: list = field(default_factory=list)
    volume_g: list = field(default_factory=list)

    def append(
        self,
        time: float,
        mass: float,
        mass_g: float,
        mass_aq: float,
        volume_g: float = 0.0,
    ) -> None:
        self.times.append(time)
        self.mass.append(mass)
        self.mass_g.append(mass_g)
        self.mass_aq.append(mass_aq)
        self.volume_g.append(volume_g)

    def reset(self) -> None:
        self.times.clear()
        self.mass.clear()
        self.mass_g.clear()
        self.mass_aq.clear()
        self.volume_g.clear()

    def clean(self, tol: float = np.inf) -> None:
        """Drop outlier entries with mass jumps beyond tol."""
        if len(self.times) < 3:
            return
        mass = np.asarray(self.mass)
        keep = np.ones(len(mass), dtype=bool)
        jumps = np.abs(np.diff(mass))
        scale = max(np.median(jumps), 1e-12)
        keep[1:] &= jumps < tol * scale
        for attr in ("times", "mass", "mass_g", "mass_aq", "volume_g"):
            values = getattr(self, attr)
            setattr(self, attr, [v for v, k in zip(values, keep) if k])

    def save(self, path: Path) -> None:
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            times=np.asarray(self.times),
            mass=np.asarray(self.mass),
            mass_g=np.asarray(self.mass_g),
            mass_aq=np.asarray(self.mass_aq),
            volume_g=np.asarray(self.volume_g),
        )

    def load(self, path: Path) -> None:
        data = np.load(Path(path))
        self.times = list(data["times"])
        self.mass = list(data["mass"])
        self.mass_g = list(data["mass_g"])
        self.mass_aq = list(data["mass_aq"])
        self.volume_g = list(data["volume_g"])

    def plot_mass_over_time(self, path=None, **kwargs):  # pragma: no cover
        import matplotlib.pyplot as plt

        plt.figure("mass over time")
        plt.plot(self.times, self.mass, label="total")
        plt.plot(self.times, self.mass_g, label="gaseous")
        plt.plot(self.times, self.mass_aq, label="aqueous")
        plt.xlabel("time [h]")
        plt.ylabel("mass [kg]")
        plt.legend()
        if path is not None:
            plt.savefig(path)
            plt.close()
        else:
            plt.show()

    def plot_volume_over_time(self, path=None, **kwargs):  # pragma: no cover
        import matplotlib.pyplot as plt

        plt.figure("volume over time")
        plt.plot(self.times, self.volume_g, label="gaseous volume")
        plt.xlabel("time [h]")
        plt.ylabel("volume [m^3]")
        plt.legend()
        if path is not None:
            plt.savefig(path)
            plt.close()
        else:
            plt.show()


class MultiphaseTimeSeriesAnalysis:
    """Accumulate integrated mass results over a time series."""

    def __init__(self, geometry: Geometry) -> None:
        self.geometry = geometry
        self.data = MultiphaseTimeSeriesData()

    def reset(self) -> None:
        self.data.reset()

    def track(self, result: MassAnalysisResults) -> None:
        """Integrate one mass-analysis result and append to the series."""
        mass = float(self.geometry.integrate(result.mass))
        mass_g = float(self.geometry.integrate(result.mass_g))
        mass_aq = float(self.geometry.integrate(result.mass_aq))
        volume_g = (
            float(self.geometry.integrate(result.saturation_g))
            if result.saturation_g is not None
            else 0.0
        )
        self.data.append(result.time, mass, mass_g, mass_aq, volume_g)

    def clean(self, threshold) -> None:
        self.data.clean(threshold)

    def save(self, path: Path) -> None:
        self.data.save(path)

    def load(self, path: Path) -> None:
        self.data.load(path)

    def plot_mass_over_time(self, path=None, **kwargs):  # pragma: no cover
        self.data.plot_mass_over_time(path, **kwargs)

    def plot_volume_over_time(self, path=None, **kwargs):  # pragma: no cover
        self.data.plot_volume_over_time(path, **kwargs)
