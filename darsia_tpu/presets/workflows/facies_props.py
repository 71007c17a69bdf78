"""Facies properties (porosity/permeability per facies label).

Parity: reference ``presets/workflows/facies_props.py:8-80``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np

__all__ = ["FaciesProps"]


class FaciesProps:
    """Per-facies porosity and permeability maps."""

    def __init__(
        self,
        facies,
        porosity: Union[float, dict] = 1.0,
        permeability: Union[float, dict] = 1.0,
    ) -> None:
        from ...multiphase.mass_analysis import full_like

        self.facies = facies
        facies_arr = np.asarray(facies.img)

        def _expand(values):
            if isinstance(values, dict):
                out = np.zeros(facies_arr.shape, dtype=float)
                for label, value in values.items():
                    out[facies_arr == int(label)] = float(value)
                return full_like(facies, out)
            return full_like(
                facies, np.full(facies_arr.shape, float(values))
            )

        self.porosity = _expand(porosity)
        self.permeability = _expand(permeability)

    @classmethod
    def load(cls, facies, path: Path) -> "FaciesProps":
        """Load facies properties from a CSV/XLSX with columns
        id/porosity/permeability."""
        import pandas as pd

        path = Path(path)
        if path.suffix.lower() == ".xlsx":
            df = pd.read_excel(path)
        elif path.suffix.lower() == ".csv":
            df = pd.read_csv(path)
        else:
            raise ValueError("Facies properties file must be .csv or .xlsx.")
        required = {"id", "porosity", "permeability"}
        if not required.issubset(df.columns):
            raise ValueError(
                f"Facies properties file must contain columns {sorted(required)}."
            )
        porosity = dict(zip(df["id"].astype(int), df["porosity"].astype(float)))
        permeability = dict(
            zip(df["id"].astype(int), df["permeability"].astype(float))
        )
        return cls(facies, porosity=porosity, permeability=permeability)
