"""Thermodynamic flash: signal -> (gas saturation, aqueous concentration).

Parity: reference ``src/darsia/multiphase/flash.py:15-260``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional
from warnings import warn

import jax.numpy as jnp
import numpy as np

__all__ = ["Flash", "AdvancedFlash", "SimpleFlash"]


class Flash:
    """Partition normalized concentrations into phase quantities."""

    def __init__(self, s_g_max: float = 1.0, s_g_cutoff: float = 0.0) -> None:
        self.s_g_max = s_g_max
        self.s_g_cutoff = s_g_cutoff

    def __call__(self, c_g, c_aq):
        """Flash of (gas, aqueous) concentration maps.

        Returns:
            (chi_g, chi_aq, s_g, s_aq): volumetric concentrations and
            saturations per phase.

        """
        cg = jnp.asarray(c_g.img, dtype=jnp.float32)
        caq = jnp.asarray(c_aq.img, dtype=jnp.float32)
        if float(cg.max()) > 1 + 1e-6:
            warn("Concentration of CO2 in gas phase has to be normalized.")
        if float(caq.max()) > 1 + 1e-6:
            warn("Concentration of CO2 in aqueous phase has to be normalized.")

        s_g_arr = self.s_g_max * jnp.clip(cg, 0.0, 1.0)
        cutoff = cg < self.s_g_cutoff
        s_g_arr = jnp.where(cutoff, 0.0, s_g_arr)
        s_aq_arr = 1.0 - s_g_arr
        chi_g_arr = s_g_arr
        chi_aq_arr = jnp.where(cutoff, s_aq_arr * caq, s_aq_arr)

        s_g = c_g.copy(); s_g.img = s_g_arr
        s_aq = c_g.copy(); s_aq.img = s_aq_arr
        chi_g = c_g.copy(); chi_g.img = chi_g_arr
        chi_aq = c_g.copy(); chi_aq.img = chi_aq_arr
        return chi_g, chi_aq, s_g, s_aq


class AdvancedFlash(Flash):
    """Flash with post-restoration of all outputs."""

    def __init__(self, s_g_max=1.0, s_g_cutoff=0.0, restoration=None) -> None:
        super().__init__(s_g_max, s_g_cutoff)
        self.restoration = restoration

    def __call__(self, c_g, c_aq):
        chi_g, chi_aq, s_g, s_aq = super().__call__(c_g, c_aq)
        if self.restoration is not None:
            chi_g = self.restoration(chi_g)
            chi_aq = self.restoration(chi_aq)
            s_g = self.restoration(s_g)
            s_aq = self.restoration(s_aq)
        return chi_g, chi_aq, s_g, s_aq


class SimpleFlash:
    """Interval-based flash from a single signal with save/load.

    Signal in [min_value_aq, max_value_aq] maps to aqueous concentration in
    [0, 1]; [min_value_g, max_value_g] maps to gas saturation in [0, 1].
    """

    def __init__(
        self,
        min_value_aq: float,
        max_value_aq: float,
        min_value_g: float,
        max_value_g: float,
        restoration=None,
    ) -> None:
        self.min_value_aq = min_value_aq
        self.max_value_aq = max_value_aq
        self.min_value_g = min_value_g
        self.max_value_g = max_value_g
        self.restoration = restoration

    def __call__(self, signal):
        data = jnp.asarray(signal.img, dtype=jnp.float32)
        c_aq_arr = jnp.clip(
            (data - self.min_value_aq)
            / max(self.max_value_aq - self.min_value_aq, 1e-12),
            0.0,
            1.0,
        )
        s_g_arr = jnp.clip(
            (data - self.min_value_g)
            / max(self.max_value_g - self.min_value_g, 1e-12),
            0.0,
            1.0,
        )
        c_aq = signal.copy(); c_aq.img = c_aq_arr
        s_g = signal.copy(); s_g.img = s_g_arr
        if self.restoration is not None:
            c_aq = self.restoration(c_aq)
            s_g = self.restoration(s_g)
        return c_aq, s_g

    def update(
        self,
        min_value_aq=None,
        max_value_aq=None,
        min_value_g=None,
        max_value_g=None,
    ) -> None:
        """Update flash bounds (reference simple flash calibration API)."""
        if min_value_aq is not None:
            self.min_value_aq = float(min_value_aq)
        if max_value_aq is not None:
            self.max_value_aq = float(max_value_aq)
        if min_value_g is not None:
            self.min_value_g = float(min_value_g)
        if max_value_g is not None:
            self.max_value_g = float(max_value_g)

    def to_dict(self) -> dict:
        """Parameter dict (reference flash.py:212-224)."""
        return {
            "min_value_aq": self.min_value_aq,
            "max_value_aq": self.max_value_aq,
            "min_value_g": self.min_value_g,
            "max_value_g": self.max_value_g,
        }

    @classmethod
    def from_dict(cls, data: dict) -> "SimpleFlash":
        """Inverse of :meth:`to_dict` (reference flash.py:226-239)."""
        return cls(
            min_value_aq=data["min_value_aq"],
            max_value_aq=data.get("max_value_aq"),
            min_value_g=data.get("min_value_g"),
            max_value_g=data.get("max_value_g"),
        )

    def save(self, path) -> None:
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            class_name=type(self).__name__,
            values=np.array(
                [
                    self.min_value_aq,
                    self.max_value_aq,
                    self.min_value_g,
                    self.max_value_g,
                ]
            ),
        )

    def load(self, path) -> None:
        data = np.load(Path(path), allow_pickle=True)
        (
            self.min_value_aq,
            self.max_value_aq,
            self.min_value_g,
            self.max_value_g,
        ) = [float(v) for v in data["values"]]
