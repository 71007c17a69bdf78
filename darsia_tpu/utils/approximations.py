"""Polynomial approximation spaces and linear LS approximations.

Parity: reference ``src/darsia/utils/approximations.py:11-243``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Literal, Optional, Union

import numpy as np

__all__ = [
    "ApproximationSpace",
    "PolynomialApproximationSpace",
    "RadialPolynomialApproximationSpace",
    "LinearApproximation",
]


class ApproximationSpace(ABC):
    """Abstract basis of scalar functions over 2d points."""

    @property
    @abstractmethod
    def size(self) -> int:
        ...

    @abstractmethod
    def basis(self, x: np.ndarray, i: int) -> np.ndarray:
        ...

    def __call__(self, x: np.ndarray) -> list[np.ndarray]:
        return [self.basis(x, i) for i in range(self.size)]


class PolynomialApproximationSpace(ApproximationSpace):
    """Tensor polynomial basis x^i y^j (indexing as in the reference)."""

    def __init__(self, degree: int) -> None:
        self.degree = degree

    @property
    def size(self) -> int:
        return (self.degree + 1) * (self.degree + 2) // 2

    def basis(self, x: np.ndarray, k: int) -> np.ndarray:
        i, j = divmod(k, self.degree + 1)
        return x[..., 0] ** i * x[..., 1] ** j


class RadialPolynomialApproximationSpace(ApproximationSpace):
    """Radial basis |x - center|^i, i <= degree."""

    def __init__(self, degree: int, center: Optional[np.ndarray] = None) -> None:
        self.degree = degree
        self.center = center if center is not None else np.zeros(2)

    def set_center(self, center: np.ndarray) -> None:
        self.center = center

    @property
    def size(self) -> int:
        return self.degree + 1

    def basis(self, x: np.ndarray, i: int) -> np.ndarray:
        return np.linalg.norm(x - self.center, axis=-1) ** i


class LinearApproximation:
    """Linear combination over an approximation space with tensor values."""

    def __init__(
        self,
        space: ApproximationSpace,
        dim: Union[int, tuple[int, int]],
        domain: Literal["voxels", "coordinates"] = "coordinates",
    ) -> None:
        self.space = space
        self.shape = (space.size, dim) if isinstance(dim, int) else (space.size, *dim)
        self.size = int(np.prod(self.shape))
        self.domain = domain
        self.coefficients = np.zeros(self.shape, dtype=float)

    def evaluate(self, inputs) -> np.ndarray:
        """Evaluate at points or over a whole coordinate system.

        Returns an array of shape (*points_shape, *value_shape).
        """
        from ..image.coordinatesystem import CoordinateSystem

        if isinstance(inputs, CoordinateSystem):
            pts = (
                np.asarray(inputs.voxels, dtype=float)
                if self.domain == "voxels"
                else np.asarray(inputs.coordinates, dtype=float)
            )
            out = self._evaluate_points(pts)
            value_shape = self.shape[1:]
            return out.reshape(
                (*inputs.shape, *value_shape), order="F"
            )
        pts = np.asarray(inputs, dtype=float)
        return self._evaluate_points(pts)

    def _evaluate_points(self, pts: np.ndarray) -> np.ndarray:
        value_size = int(np.prod(self.shape[1:]))
        flat = np.zeros((len(pts), value_size))
        for i in range(self.space.size):
            flat += np.outer(
                self.space.basis(pts, i), np.ravel(self.coefficients[i])
            )
        return flat.reshape((len(pts), *self.shape[1:]))

    def fit(self, pts: np.ndarray, values: np.ndarray) -> None:
        """Closed-form LS fit of the coefficients from point samples."""
        pts = np.asarray(pts, dtype=float)
        design = np.stack(
            [self.space.basis(pts, i) for i in range(self.space.size)], axis=1
        )
        value_size = int(np.prod(self.shape[1:]))
        target = np.asarray(values, dtype=float).reshape(len(pts), value_size)
        sol, *_ = np.linalg.lstsq(design, target, rcond=None)
        self.coefficients = sol.reshape(self.shape)
