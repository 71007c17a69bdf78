"""Dynamic illumination correction — per-image global rescaling.

Parity: reference
``src/darsia/corrections/color/dynamicilluminationcorrection.py:14-183``.

Setup extracts characteristic base colors from samples of a baseline; each
corrected image is rescaled by the per-channel factors minimizing the
distance of its sample colors to the base colors.  The per-channel LS
minimizer is closed-form (the reference uses scipy.minimize).
"""

from __future__ import annotations

from pathlib import Path
from typing import Literal, Optional

import jax.numpy as jnp
import numpy as np

from ...utils.extractcharacteristicdata import extract_characteristic_data
from ..base import BaseCorrection

__all__ = ["DynamicIlluminationCorrection"]


class DynamicIlluminationCorrection(BaseCorrection):
    """Global per-image illumination rescaling against baseline colors."""

    def setup(
        self,
        base,
        samples: list[tuple[slice, ...]],
        colorspace: Literal["rgb"] = "rgb",
    ) -> None:
        """Extract characteristic base colors for later re-fits.

        Args:
            base: baseline image.
            samples: sample regions used for the color characterization.

        """
        self.colorspace = colorspace
        self.samples = samples
        arr = np.asarray(base.img if hasattr(base, "img") else base)
        if arr.dtype in (np.uint8, np.uint16):
            from ...utils.dtype import convert_dtype

            arr = np.asarray(convert_dtype(arr, np.float32))
        self.base_colors = extract_characteristic_data(signal=arr, samples=samples)

    def extract_characteristic_colors(self, image) -> np.ndarray:
        arr = np.asarray(image.img if hasattr(image, "img") else image)
        if arr.dtype in (np.uint8, np.uint16):
            from ...utils.dtype import convert_dtype

            arr = np.asarray(convert_dtype(arr, np.float32))
        return extract_characteristic_data(signal=arr, samples=self.samples)

    def correct_array(self, img: jnp.ndarray) -> jnp.ndarray:
        if not hasattr(self, "base_colors"):
            return jnp.asarray(img)
        colors = self.extract_characteristic_colors(np.asarray(img))
        if len(colors) == 0:
            return jnp.asarray(img)
        # Closed-form per-channel scaling: min_s sum (s*c - b)^2.
        c = np.asarray(colors, dtype=float)
        b = np.asarray(self.base_colors, dtype=float)
        denom = np.sum(c * c, axis=0)
        scaling = np.where(denom > 0, np.sum(c * b, axis=0) / denom, 1.0)
        return jnp.asarray(img) * jnp.asarray(scaling, dtype=jnp.float32)

    def save(self, path: Path) -> None:
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        samples_serial = [
            [[s[0].start, s[0].stop], [s[1].start, s[1].stop]] for s in self.samples
        ]
        np.savez(
            path,
            class_name=type(self).__name__,
            base_colors=self.base_colors,
            samples=np.array(samples_serial),
            colorspace=self.colorspace,
        )

    def load(self, path: Path) -> None:
        data = np.load(Path(path), allow_pickle=True)
        self.base_colors = data["base_colors"]
        self.colorspace = str(data["colorspace"])
        self.samples = [
            (slice(int(s[0][0]), int(s[0][1])), slice(int(s[1][0]), int(s[1][1])))
            for s in data["samples"]
        ]
