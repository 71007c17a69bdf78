"""Criterion-based selection of connected mask regions.

Parity: reference ``src/darsia/signals/models/binarydataselector.py:17-228``.
Connected-component labelling is host scipy.ndimage (mask cleanup path);
per-region criteria are vectorized via labelled reductions
(``ndimage.labeled_comprehension``-style maxima) instead of Python loops
over regions.
"""

from __future__ import annotations

import abc
from typing import Callable, Optional, Union

import numpy as np
from scipy import ndimage

from ...utils.derivatives import forward_diff
from ..reduction.signalreduction import MonochromaticReduction

__all__ = [
    "BaseCriterion",
    "ValueCriterion",
    "RelativeValueCriterion",
    "TransformedValueCriterion",
    "GradientModulusCriterion",
    "CombinedCriterion",
    "BinaryDataSelector",
]


class BaseCriterion:
    """Abstract per-region acceptance criterion."""

    type = "volume"

    def bind(self, signal: np.ndarray, unprocessed_signal: np.ndarray) -> None:
        self.signal = np.asarray(signal)

    @abc.abstractmethod
    def accept_regions(self, labels: np.ndarray, num: int) -> np.ndarray:
        """Boolean acceptance per label id (1..num)."""


class ValueCriterion(BaseCriterion):
    """Accept regions whose max signal value exceeds a threshold."""

    def __init__(self, threshold: float) -> None:
        self.threshold = threshold

    def accept_regions(self, labels, num):
        maxima = ndimage.maximum(self.signal, labels, index=np.arange(1, num + 1))
        return np.atleast_1d(maxima) > self.threshold


class RelativeValueCriterion(BaseCriterion):
    """Accept regions with max > threshold * min."""

    def __init__(self, threshold: float) -> None:
        self.threshold = threshold

    def accept_regions(self, labels, num):
        idx = np.arange(1, num + 1)
        maxima = np.atleast_1d(ndimage.maximum(self.signal, labels, index=idx))
        minima = np.atleast_1d(ndimage.minimum(self.signal, labels, index=idx))
        return maxima > self.threshold * minima


class TransformedValueCriterion(BaseCriterion):
    """Value criterion on a transform of the unprocessed signal."""

    def __init__(self, transformation: Callable, threshold: float) -> None:
        self.transformation = transformation
        self.threshold = threshold

    def bind(self, signal, unprocessed_signal) -> None:
        self.signal = np.asarray(self.transformation(unprocessed_signal))

    def accept_regions(self, labels, num):
        maxima = ndimage.maximum(self.signal, labels, index=np.arange(1, num + 1))
        return np.atleast_1d(maxima) > self.threshold


class GradientModulusCriterion(BaseCriterion):
    """Accept regions whose boundary gradient modulus is large."""

    type = "contour"

    def __init__(self, threshold: Optional[float] = None, key: str = "", **kwargs):
        self.threshold = threshold

    def bind(self, signal, unprocessed_signal) -> None:
        import jax.numpy as jnp

        s = jnp.asarray(signal, dtype=jnp.float32)
        dx = forward_diff(s, 0, 2)
        dy = forward_diff(s, 1, 2)
        self.signal = np.asarray(jnp.sqrt(dx**2 + dy**2))

    def accept_regions(self, labels, num):
        # Evaluate on region boundaries: dilate each region and take the rim.
        boundary = labels != ndimage.grey_erosion(labels, size=(3, 3))
        grad = np.where(boundary, self.signal, 0.0)
        maxima = ndimage.maximum(grad, labels, index=np.arange(1, num + 1))
        return np.atleast_1d(maxima) > self.threshold


class CombinedCriterion(BaseCriterion):
    """All sub-criteria must accept."""

    def __init__(self, criteria: list) -> None:
        self.criteria = criteria
        self.type = criteria[0].type if criteria else "volume"

    def bind(self, signal, unprocessed_signal) -> None:
        for criterion in self.criteria:
            criterion.bind(signal, unprocessed_signal)

    def accept_regions(self, labels, num):
        accepts = [c.accept_regions(labels, num) for c in self.criteria]
        return np.logical_and.reduce(accepts)


class BinaryDataSelector:
    """Keep only connected mask regions satisfying a criterion."""

    def __init__(self, criterion: Optional[BaseCriterion] = None, key: str = "", **kwargs):
        if criterion is not None:
            self.criterion = criterion
        else:
            criterion_key = kwargs.get(key + "criterion")
            threshold = kwargs.get(key + "threshold")
            if criterion_key == "value":
                self.criterion = ValueCriterion(threshold)
            elif criterion_key == "relative value":
                self.criterion = RelativeValueCriterion(threshold)
            elif criterion_key == "value/value extra color":
                value_criterion = ValueCriterion(threshold[0])
                color = kwargs.get(key + "extra color")
                transformation = MonochromaticReduction(color=color)
                extra = TransformedValueCriterion(transformation, threshold[1])
                self.criterion = CombinedCriterion([value_criterion, extra])
            elif criterion_key == "gradient modulus":
                self.criterion = GradientModulusCriterion(threshold)
            else:
                raise ValueError(f"Criterion type {criterion_key} not supported.")
        self.type = getattr(self.criterion, "type", "volume")

    def __call__(
        self, signal: np.ndarray, mask: np.ndarray, unprocessed_signal: np.ndarray
    ) -> np.ndarray:
        self.criterion.bind(signal, unprocessed_signal)
        mask = np.asarray(mask, dtype=bool)
        labels, num = ndimage.label(mask)
        if num == 0:
            return np.zeros_like(mask)
        accept = self.criterion.accept_regions(labels, num)
        keep = np.concatenate([[False], accept])
        return keep[labels]
