"""Per-label containers of color paths / spectra / colors.

Parity: reference ``signals/color/label_color_{map,path_map,spectrum_map}.py``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

from .color_path import ColorPath
from .color_range import ColorSpectrum

__all__ = ["LabelColorMap", "LabelColorPathMap", "LabelColorSpectrumMap"]


class LabelColorMap(dict):
    """label -> representative color."""

    def save(self, path: Path) -> None:
        path = Path(path).with_suffix(".json")
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(
            json.dumps({str(k): np.asarray(v).tolist() for k, v in self.items()})
        )

    @classmethod
    def load(cls, path: Path) -> "LabelColorMap":
        data = json.loads(Path(path).with_suffix(".json").read_text())
        return cls({int(k): np.asarray(v) for k, v in data.items()})


class LabelColorPathMap(dict):
    """label -> ColorPath, persisted as a folder of json paths."""

    def save(self, folder: Path) -> None:
        folder = Path(folder)
        folder.mkdir(parents=True, exist_ok=True)
        for label, color_path in self.items():
            color_path.save(folder / f"label_{label}.json")

    @classmethod
    def load(cls, folder: Path) -> "LabelColorPathMap":
        folder = Path(folder)
        out = cls()
        for file in sorted(folder.glob("label_*.json")):
            label = int(file.stem.split("_")[1])
            out[label] = ColorPath.load(file)
        return out


class LabelColorSpectrumMap(dict):
    """label -> ColorSpectrum, persisted as a folder of npz spectra."""

    def save(self, folder: Path) -> None:
        folder = Path(folder)
        folder.mkdir(parents=True, exist_ok=True)
        for label, spectrum in self.items():
            spectrum.save(folder / f"label_{label}.npz")

    @classmethod
    def load(cls, folder: Path) -> "LabelColorSpectrumMap":
        folder = Path(folder)
        out = cls()
        for file in sorted(folder.glob("label_*.npz")):
            label = int(file.stem.split("_")[1])
            out[label] = ColorSpectrum.load(file)
        return out
