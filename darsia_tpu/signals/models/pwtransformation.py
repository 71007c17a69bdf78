"""Monotone piecewise-linear transformation of a scalar signal.

Parity: reference ``signals/models/pwtransformation.py:16-140``.

TPU deviation: evaluation is one fused ``jnp.interp`` instead of a
scipy interp1d object.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional
from warnings import warn

import jax.numpy as jnp
import numpy as np

__all__ = ["PWTransformation"]


class PWTransformation:
    """Piecewise-linear transformation with enforced monotonicity."""

    def __init__(self, supports=None, values=None) -> None:
        self.supports = None if supports is None else np.asarray(supports, float)
        self.values = None if values is None else np.asarray(values, float)
        if supports is not None and values is not None:
            self.update(supports, values)

    def update(self, supports=None, values=None, dofs=None) -> None:
        if supports is not None:
            supports = np.asarray(supports, dtype=float)
            if dofs is not None:
                self.supports[np.asarray(dofs)] = supports
            else:
                self.supports = supports
        if values is not None:
            values = np.asarray(values, dtype=float)
            if dofs is not None:
                self.values[np.asarray(dofs)] = values
            else:
                self.values = values
        if self.supports is None or self.values is None:
            warn("No supports or values provided. Interpolator not updated.")
            return
        assert len(self.values) == len(self.supports), (
            f"wrong size: {len(self.values)} vs. {len(self.supports)}"
        )
        diff = np.diff(self.values)
        assert np.all(diff > -1e-12), f"monotonicity broken {diff}"

    def values_from_diff(self, values_diff) -> np.ndarray:
        """Node values from segment increments: ``[0, cumsum(diff)]``
        (the reference declares this seam but leaves it dead,
        pwtransformation.py:65-67; here it works and feeds update())."""
        return np.hstack(([0.0], np.cumsum(np.asarray(values_diff, float))))

    def __call__(self, img):
        assert self.supports is not None and self.values is not None, (
            "Interpolator not set."
        )
        if hasattr(img, "img"):
            out = img.copy()
            out.img = self._call_for_array(jnp.asarray(img.img))
            return out
        return self._call_for_array(jnp.asarray(img))

    # Model-protocol alias (usable inside HeterogeneousModel).
    def call_array(self, arr):
        return self._call_for_array(jnp.asarray(arr))

    def _call_for_array(self, arr):
        return jnp.interp(
            arr.astype(jnp.float32),
            jnp.asarray(self.supports, jnp.float32),
            jnp.asarray(self.values, jnp.float32),
        )

    def inverse(self, value):
        """Inverse transformation (extrapolating linearly outside)."""
        values = np.asarray(self.values, float)
        supports = np.asarray(self.supports, float)
        value = np.asarray(value, float)
        # Strictly increasing segments only for a well-defined inverse.
        out = np.interp(value, values, supports)
        # Linear extrapolation beyond the range.
        if values[-1] > values[0]:
            lo_slope = (supports[1] - supports[0]) / max(
                values[1] - values[0], 1e-12
            )
            hi_slope = (supports[-1] - supports[-2]) / max(
                values[-1] - values[-2], 1e-12
            )
            out = np.where(
                value < values[0], supports[0] + (value - values[0]) * lo_slope, out
            )
            out = np.where(
                value > values[-1],
                supports[-1] + (value - values[-1]) * hi_slope,
                out,
            )
        return out if out.ndim else float(out)

    def save(self, path: Path) -> None:
        import pandas as pd

        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        pd.DataFrame(
            {"supports": self.supports, "values": self.values}
        ).to_csv(path.with_suffix(".csv"), index=False)

    @classmethod
    def load(cls, path: Path) -> "PWTransformation":
        import pandas as pd

        df = pd.read_csv(Path(path).with_suffix(".csv"))
        return cls(
            supports=df["supports"].to_numpy(), values=df["values"].to_numpy()
        )

    def log(self, log: Optional[Path]) -> None:  # pragma: no cover - visual
        if not log:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        x = np.linspace(float(self.supports[0]), float(self.supports[-1]), 1000)
        plt.figure()
        plt.plot(x, np.asarray(self._call_for_array(jnp.asarray(x))))
        plt.xlabel("Signal")
        plt.ylabel("Converted signal")
        plt.savefig(log)
        plt.close()
