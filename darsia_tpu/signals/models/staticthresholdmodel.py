"""Static threshold model (homogeneous / per-label).

Parity: reference ``src/darsia/signals/models/staticthresholdmodel.py:17``.
TPU note: heterogeneous thresholds are materialized as threshold *fields*
(label lookup) so the application is a branch-free fused comparison.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from .basemodel import Model

__all__ = ["StaticThresholdModel"]


class StaticThresholdModel(Model):
    """Threshold the signal into a boolean (or float) mask."""

    def __init__(
        self,
        threshold_lower: Union[float, list] = 0.0,
        threshold_upper: Optional[Union[float, list]] = None,
        labels: Optional[np.ndarray] = None,
        return_float: bool = False,
    ) -> None:
        self.return_float = return_float
        if labels is None:
            self._is_homogeneous = True
            self._threshold_lower = float(threshold_lower)
            self._threshold_upper = (
                None if threshold_upper is None else float(threshold_upper)
            )
            self.num_parameters = 2
        else:
            self._is_homogeneous = False
            self._labels = np.asarray(labels)
            self._unique_labels = np.unique(self._labels)
            num_labels = len(self._unique_labels)
            self._threshold_lower = self._expand(threshold_lower, num_labels)
            self._threshold_upper = (
                None
                if threshold_upper is None
                else self._expand(threshold_upper, num_labels)
            )
            self.num_parameters = 2 * num_labels

    @staticmethod
    def _expand(value, num_labels):
        if isinstance(value, (list, np.ndarray)):
            arr = np.asarray(value, dtype=float)
            assert len(arr) == num_labels
            return arr
        return float(value) * np.ones(num_labels, dtype=float)

    def _threshold_fields(self):
        lower = np.zeros(self._labels.shape, dtype=np.float32)
        upper = (
            None
            if self._threshold_upper is None
            else np.zeros(self._labels.shape, dtype=np.float32)
        )
        for i, label in enumerate(self._unique_labels):
            mask = self._labels == label
            lower[mask] = self._threshold_lower[i]
            if upper is not None:
                upper[mask] = self._threshold_upper[i]
        return jnp.asarray(lower), None if upper is None else jnp.asarray(upper)

    def __call__(self, img, mask: Optional[np.ndarray] = None):
        if hasattr(img, "img"):
            out = img.copy()
            out.img = self.__call__(jnp.asarray(img.img), mask)
            return out
        img = jnp.asarray(img)
        if self._is_homogeneous:
            result = img > self._threshold_lower
            if self._threshold_upper is not None:
                result = result & (img < self._threshold_upper)
        else:
            lower, upper = self._threshold_fields()
            result = img > lower
            if upper is not None:
                result = result & (img < upper)
        if mask is not None:
            result = result & jnp.asarray(mask)
            return result
        if self.return_float:
            return result.astype(jnp.float32)
        return result

    def update_model_parameters(self, parameters, dofs=None) -> None:
        parameters = np.asarray(parameters)
        if self._is_homogeneous:
            self._threshold_lower = float(parameters[0])
            if len(parameters) > 1 and self._threshold_upper is not None:
                self._threshold_upper = float(parameters[1])
        else:
            n = len(self._unique_labels)
            self._threshold_lower = parameters[:n]
            if self._threshold_upper is not None and len(parameters) >= 2 * n:
                self._threshold_upper = parameters[n : 2 * n]
