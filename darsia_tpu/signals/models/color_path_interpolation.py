"""Color-path interpolation models: colors -> scalar signal.

Parity: reference ``signals/models/color_path_interpolation.py:16-261``
(ColorPathFunction, ColorPathInterpolation).  ``LabelColorPathInterpolation``
covers the per-label use of the reference's color-path embeddings.

TPU deviation: parametrization + piecewise-linear value interpolation are
fused into one vectorized program (``jnp.interp`` over equidistant nodes)
instead of the reference's per-segment masked loops.
"""

from __future__ import annotations

import abc
import json
from pathlib import Path
from typing import Literal, Optional, Union

import jax.numpy as jnp
import numpy as np

from ...image.image import Image
from ..color.color_mode import ColorMode
from .basemodel import Model

__all__ = [
    "ColorPathFunction",
    "ColorPathInterpolation",
    "LabelColorPathInterpolation",
]


class ColorPathFunction(Model):
    """Model defined through a color path."""

    def __init__(self, color_path, color_mode: ColorMode) -> None:
        self.color_path = color_path
        self.color_mode = color_mode

    @abc.abstractmethod
    def update_model_parameters(self, parameters, dofs=None) -> None: ...

    @abc.abstractmethod
    def __call__(self, image): ...


class ColorPathInterpolation(ColorPathFunction):
    """Parametrize colors along a path, then map the parameter through
    piecewise-linear values at the path nodes."""

    def __init__(
        self,
        color_path,
        color_mode: ColorMode,
        values: Optional[Union[np.ndarray, list]] = None,
        ignore_spectrum=None,
    ) -> None:
        super().__init__(color_path, color_mode)
        self.values = np.asarray(
            values if values is not None else color_path.equidistant_distances,
            dtype=float,
        )
        assert len(self.values) == color_path.num_segments + 1, (
            "Length of values must match number of segments + 1."
        )
        self.ignore_spectrum = ignore_spectrum

    def __str__(self) -> str:
        return (
            f"ColorPathInterpolation(color_mode={self.color_mode}, "
            f"values={self.values.tolist()})"
        )

    __repr__ = __str__

    def update_model_parameters(self, parameters, dofs=None) -> None:
        self.values = np.asarray(parameters, dtype=float)

    def calibrate(self):
        raise NotImplementedError(
            "ColorPathInterpolation does not support calibration."
        )

    # ------------------------------------------------------------------- io

    def to_dict(self) -> dict:
        return {
            "color_path": self.color_path.to_dict(),
            "color_mode": str(
                self.color_mode.value
                if isinstance(self.color_mode, ColorMode)
                else self.color_mode
            ),
            "values": self.values.tolist(),
            "ignore_spectrum": (
                self.ignore_spectrum.to_dict() if self.ignore_spectrum else None
            ),
        }

    @classmethod
    def from_dict(cls, data: dict) -> "ColorPathInterpolation":
        from ..color.color_path import ColorPath
        from ..color.color_range import ColorSpectrum

        return cls(
            color_path=ColorPath.from_dict(data["color_path"]),
            color_mode=ColorMode(data["color_mode"]),
            values=np.asarray(data["values"]),
            ignore_spectrum=(
                ColorSpectrum.from_dict(data["ignore_spectrum"])
                if data.get("ignore_spectrum")
                else None
            ),
        )

    def save(self, path: Path) -> None:
        path = Path(path).with_suffix(".json")
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def load(cls, path: Path) -> "ColorPathInterpolation":
        return cls.from_dict(
            json.loads(Path(path).with_suffix(".json").read_text())
        )

    # ------------------------------------------------------------- evaluate

    def call_array(self, colors: np.ndarray) -> np.ndarray:
        """Colors (..., 3) -> interpolated scalar values."""
        colors = np.asarray(colors, dtype=float)
        if self.ignore_spectrum is not None and colors.ndim > 1:
            color_mask = np.linalg.norm(colors, axis=-1) > 1e-1
            parametrization = np.zeros(colors.shape[:-1])
            if np.any(color_mask):
                parametrization[color_mask] = self.color_path.fit(
                    colors=colors[color_mask],
                    color_mode=self.color_mode,
                    mode="equidistant",
                )
        else:
            parametrization = self.color_path.fit(
                colors=colors, color_mode=self.color_mode, mode="equidistant"
            )
        nodes = jnp.asarray(
            self.color_path.equidistant_distances, dtype=jnp.float32
        )
        vals = jnp.asarray(self.values, dtype=jnp.float32)
        p = jnp.asarray(parametrization, jnp.float32)
        out = jnp.interp(p, nodes, vals)
        # The reference extrapolates linearly past the end nodes with the
        # end-segment slopes (ref color_path_interpolation.py:237-259:
        # the first/last segment masks are one-sided), which jnp.interp
        # clamps — restore the extrapolation so over-/under-saturated
        # colors map beyond the calibrated value range.
        lo_slope = (vals[1] - vals[0]) / (nodes[1] - nodes[0])
        hi_slope = (vals[-1] - vals[-2]) / (nodes[-1] - nodes[-2])
        out = jnp.where(p < nodes[0], vals[0] + (p - nodes[0]) * lo_slope, out)
        out = jnp.where(
            p > nodes[-1], vals[-1] + (p - nodes[-1]) * hi_slope, out
        )
        return np.asarray(out)

    def __call__(self, image):
        if isinstance(image, Image):
            from ...multiphase.mass_analysis import full_like

            return full_like(image, self.call_array(np.asarray(image.img)))
        return self.call_array(image)


class LabelColorPathInterpolation(Model):
    """Per-label color-path interpolation blended by a label field.

    Covers the heterogeneous use in the reference's ColorPathEmbedding
    (color_embedding_path.py): each label has its own calibrated path.
    """

    def __init__(
        self,
        color_paths: dict,
        labels: np.ndarray,
        color_mode: ColorMode,
        values: Optional[dict] = None,
    ) -> None:
        self.color_mode = color_mode
        self.labels = np.asarray(labels)
        self.models = {
            label: ColorPathInterpolation(
                path,
                color_mode,
                values=values.get(label) if values else None,
            )
            for label, path in color_paths.items()
        }

    def update_model_parameters(self, parameters, dofs=None) -> None:
        for label, params in parameters.items():
            self.models[label].update_model_parameters(params)

    def call_array(self, colors: np.ndarray) -> np.ndarray:
        colors = np.asarray(colors, dtype=float)
        out = np.zeros(colors.shape[:-1], dtype=float)
        for label, model in self.models.items():
            mask = self.labels == label
            if not np.any(mask):
                continue
            out[mask] = model.call_array(colors[mask])
        return out

    def __call__(self, image):
        if isinstance(image, Image):
            from ...multiphase.mass_analysis import full_like

            return full_like(image, self.call_array(np.asarray(image.img)))
        return self.call_array(image)
