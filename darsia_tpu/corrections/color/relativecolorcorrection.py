"""Relative (spatially varying polynomial) color correction.

Parity: reference ``src/darsia/corrections/color/relativecolorcorrection.py``.

A per-pixel 3x3 color matrix, whose entries vary over the image as a
polynomial in the coordinates (LinearApproximation), calibrated from sets of
"similar colors" sampled across calibration images.  The interactive
selection assistant of the reference is replaced by the programmatic
:meth:`add_calibration_data`; the calibration itself is a closed-form least
squares solve.  Application is a batched per-pixel matrix-vector product.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from ...utils.approximations import (
    LinearApproximation,
    PolynomialApproximationSpace,
)
from ..base import BaseCorrection

__all__ = ["RelativeColorCorrection"]


class RelativeColorCorrection(BaseCorrection):
    """Heterogeneous polynomial color correction."""

    def __init__(
        self,
        baseline=None,
        images=None,
        config: Optional[dict] = None,
    ) -> None:
        self.baseline = baseline
        self.calibration_images = (
            [images] if images is not None and hasattr(images, "img") else images
        )
        self.config = config if config is not None else {}
        self.correction = self.define_correction()
        self.data: list[tuple[np.ndarray, np.ndarray]] = []
        self.reference_data: list[np.ndarray] = []
        self._evaluated = None

    def define_correction(self) -> LinearApproximation:
        ansatz = self.config.get("method", "polynomial")
        if ansatz != "polynomial":
            raise ValueError(f"Ansatz {ansatz!r} is not supported.")
        degree = self.config.get("degree", 2)
        space = PolynomialApproximationSpace(degree)
        return LinearApproximation(space, (3, 3), domain="coordinates")

    # ------------------------------------------------------------ calibration

    def add_calibration_data(
        self,
        coordinates: np.ndarray,
        colors: np.ndarray,
        reference_color: np.ndarray,
    ) -> None:
        """Register a group of similar colors and their reference.

        Args:
            coordinates: (N, 2) physical coordinates of the samples.
            colors: (N, 3) observed colors at those positions.
            reference_color: (3,) color they all should map to.

        """
        self.data.append((np.asarray(coordinates, float), np.asarray(colors, float)))
        self.reference_data.append(np.asarray(reference_color, float))

    def calibrate(self) -> None:
        """LS-fit the polynomial coefficients of the 3x3 correction field.

        For each sample: basis(coord)_i * C_i @ color = reference, linear in
        the stacked coefficients C.
        """
        assert self.data, "No calibration data provided."
        space = self.correction.space
        rows = []
        rhs = []
        for (coords, colors), ref in zip(self.data, self.reference_data):
            basis = np.stack(
                [space.basis(coords, i) for i in range(space.size)], axis=1
            )  # (N, S)
            for n in range(coords.shape[0]):
                # For each output channel r: sum_i b_i * C[i][r, :] @ color = ref[r]
                for r in range(3):
                    row = np.zeros((space.size, 3, 3))
                    row[:, r, :] = np.outer(basis[n], colors[n])
                    rows.append(row.ravel())
                    rhs.append(ref[r])
        A = np.stack(rows)
        b = np.asarray(rhs)
        sol, *_ = np.linalg.lstsq(A, b, rcond=None)
        self.correction.coefficients = sol.reshape(self.correction.shape)

    def setup(self) -> None:
        """Evaluate the correction field over the baseline's grid (cached)."""
        assert self.baseline is not None, "Baseline image required for setup."
        self._evaluated = jnp.asarray(
            self.correction.evaluate(self.baseline.coordinatesystem),
            dtype=jnp.float32,
        )

    # ------------------------------------------------------------ correction

    def correct_array(self, img: jnp.ndarray) -> jnp.ndarray:
        assert self._evaluated is not None, "Call setup() before correcting."
        img = jnp.asarray(img, dtype=jnp.float32)
        return jnp.einsum("ijkl,ijl->ijk", self._evaluated, img, precision="highest")

    # ------------------------------------------------------------------ I/O

    def save(self, path) -> None:
        from pathlib import Path

        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            class_name=type(self).__name__,
            coefficients=self.correction.coefficients,
            config=np.array([self.config], dtype=object),
        )

    def load(self, path) -> None:
        data = np.load(path, allow_pickle=True)
        self.config = data["config"][0]
        self.correction = self.define_correction()
        self.correction.coefficients = data["coefficients"]
        if self.baseline is not None:
            self.setup()
