"""Signal reductions: multichromatic -> scalar signals.

Parity: reference ``src/darsia/signals/reduction/signalreduction.py:9`` and
``monochromatic.py:13-95`` (cv2/skimage replaced by JAX color ops; the hsv
path follows the skimage convention with hue in [0, 1]).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ops.color import rgb_to_gray, rgb_to_hsv

__all__ = ["SignalReduction", "MonochromaticReduction"]


class SignalReduction:
    """Identity reduction of an (assumed scalar) signal."""

    def __call__(self, img):
        return img


class MonochromaticReduction(SignalReduction):
    """Reduce RGB signals to a scalar channel/feature.

    Supported colors: gray, red, green, blue, red+green, negative-key, hsv
    (value masked by hue/saturation bounds), a callable, or "" (identity).
    """

    def __init__(self, **kwargs) -> None:
        self.color = kwargs.get("color", "gray")
        self.verbosity = kwargs.get("verbosity", 0)
        if self.color == "hsv":
            self.hue_lower_bound = kwargs.get("hue lower bound", 0.0)
            self.hue_upper_bound = kwargs.get("hue upper bound", 360.0)
            self.saturation_lower_bound = kwargs.get("saturation lower bound", 0.0)
            self.saturation_upper_bound = kwargs.get("saturation upper bound", 1.0)

    def __call__(self, img):
        img = jnp.asarray(img)
        if self.color == "hsv":
            hsv = rgb_to_hsv(img.astype(jnp.float32))
            hue = hsv[..., 0] / 360.0  # skimage convention: [0, 1]
            sat = hsv[..., 1]
            value = hsv[..., 2]
            mask = (
                (hue > self.hue_lower_bound)
                & (hue < self.hue_upper_bound)
                & (sat > self.saturation_lower_bound)
                & (sat < self.saturation_upper_bound)
            )
            return jnp.where(mask, value, 0.0)
        if self.color == "gray":
            return rgb_to_gray(img.astype(jnp.float32))
        if self.color == "red":
            return img[..., 0]
        if self.color == "green":
            return img[..., 1]
        if self.color == "blue":
            return img[..., 2]
        if self.color == "red+green":
            return img[..., 0] + img[..., 1]
        if self.color == "negative-key":
            cmy = 1 - img
            key = jnp.min(cmy, axis=-1)
            return 1 - key
        if callable(self.color):
            return self.color(img)
        if self.color == "":
            return img
        raise ValueError(f"Mono-colored space {self.color} not supported.")
