"""Experimental color correction (EOTF + polynomial matching).

Parity: reference
``src/darsia/corrections/color/experimentalcolorcorrection.py:31-336``.

The colour-science workflow (decode gamma, match detected swatches to the
classic checker via polynomial correction, re-encode) re-expressed with our
JAX EOTF and Cheung-2004 ops.  The checker is located by a user-provided ROI
(tuple of slices), as in the reference examples.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...ops.polynomial_color import colour_correction
from ...utils.dtype import convert_dtype
from ..base import BaseCorrection
from .colorcorrection import ColorCheckerAfter2014, CustomColorChecker

__all__ = ["EOTF", "ExperimentalColorCorrection"]


class EOTF:
    """Electro-optical transfer function (sRGB-like gamma 2.2)."""

    def __init__(self) -> None:
        self.gamma = 2.2

    def adjust(self, image: jnp.ndarray) -> jnp.ndarray:
        """Decode: gamma-expand to linear light."""
        return jnp.clip(jnp.asarray(image, jnp.float32), 0.0, 1.0) ** self.gamma

    def inverse_approx(self, image: jnp.ndarray) -> jnp.ndarray:
        """Encode: gamma-compress back to display space."""
        return jnp.clip(jnp.asarray(image, jnp.float32), 0.0, 1.0) ** (
            1.0 / self.gamma
        )


class ExperimentalColorCorrection(BaseCorrection):
    """EOTF-decoded polynomial color correction against the classic checker."""

    def __init__(
        self,
        roi: Optional[tuple] = None,
        verbosity: bool = False,
        **kwargs,
    ) -> None:
        self.roi = roi
        self.verbosity = verbosity
        self.eotf = EOTF()
        self.colorchecker = ColorCheckerAfter2014()

    def correct_array(self, img) -> jnp.ndarray:
        img = np.asarray(img)
        if img.dtype in (np.uint8, np.uint16):
            img = np.asarray(convert_dtype(img, np.float32))
        decoded = self.eotf.adjust(jnp.asarray(img))

        checker_crop = (
            np.asarray(decoded[self.roi]) if self.roi is not None else np.asarray(decoded)
        )
        swatches = CustomColorChecker(image=checker_crop).swatches_rgb
        reference = np.asarray(
            self.eotf.adjust(jnp.asarray(self.colorchecker.swatches_rgb))
        )

        corrected = colour_correction(
            decoded,
            swatches.reshape((24, 3), order="F"),
            reference.reshape((24, 3), order="F"),
        )
        return self.eotf.inverse_approx(corrected).astype(jnp.float32)

    def save(self, path: Path) -> None:
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        roi_serial = (
            None
            if self.roi is None
            else [[s.start, s.stop] for s in self.roi]
        )
        np.savez(
            path,
            class_name=type(self).__name__,
            roi=np.array(roi_serial if roi_serial else []),
        )

    def load(self, path: Path) -> None:
        data = np.load(Path(path), allow_pickle=True)
        roi = data["roi"]
        self.roi = (
            tuple(slice(int(r[0]), int(r[1])) for r in roi) if roi.size else None
        )
