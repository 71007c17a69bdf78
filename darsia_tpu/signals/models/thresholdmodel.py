"""Thresholding model facade (static vs dynamic dispatch by options).

Parity: reference ``signals/models/thresholdmodel.py:13-80``.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from .dynamicthresholdmodel import DynamicThresholdModel
from .staticthresholdmodel import StaticThresholdModel

__all__ = ["ThresholdModel"]


class ThresholdModel:
    """Manager of available thresholding models.

    Options (with ``key`` prefix): ``threshold dynamic`` (bool),
    ``threshold value`` (float|list), ``threshold method``,
    ``threshold value min`` / ``threshold value max``.
    """

    def __init__(
        self, labels: Optional[np.ndarray] = None, key: str = "", **kwargs
    ) -> None:
        if kwargs.get(key + "threshold dynamic", False):
            method = kwargs.get(key + "threshold method", "otsu")
            # Map reference method names onto our dynamic model.
            if "min" in method or "two" in method:
                method = "two-peak"
            elif "otsu" in method or "tailored" in method:
                method = "otsu"
            self.model = DynamicThresholdModel(
                method=method,
                threshold_min=kwargs.get(key + "threshold value min", 0.0),
                threshold_max=kwargs.get(key + "threshold value max", 1.0),
                labels=labels,
                key=key,
                **{k: v for k, v in kwargs.items() if "threshold" not in k},
            )
        else:
            self.model = StaticThresholdModel(
                threshold_lower=kwargs.get(key + "threshold value", 0.0),
                labels=labels,
            )

    def __call__(self, img, mask: Optional[np.ndarray] = None):
        return self.model(img, mask)

    def update_model_parameters(self, parameters, dofs=None) -> None:
        self.model.update_model_parameters(parameters, dofs)
