"""Model protocol: signal -> physical data conversion.

Parity: reference ``src/darsia/signals/models/basemodel.py:16-92``.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

__all__ = ["Model", "HeterogeneousModel"]


class Model:
    """Base model: callable on arrays or Images (same return type)."""

    def __call__(self, img, *args):
        if hasattr(img, "img"):
            out = img.copy()
            out.img = self.call_array(jnp.asarray(img.img), *args)
            return out
        return self.call_array(jnp.asarray(img), *args)

    def call_array(self, signal: jnp.ndarray, *args) -> jnp.ndarray:
        raise NotImplementedError

    def calibrate(self, *args, **kwargs) -> None:
        raise NotImplementedError

    def update_model_parameters(self, parameters: np.ndarray, dofs=None) -> None:
        raise NotImplementedError


class HeterogeneousModel(Model):
    """Per-label model: applies a dedicated model within each label region.

    TPU note: instead of boolean-masked in-place updates per label (reference
    loop), each sub-model is evaluated on the full array and blended with
    `jnp.where` — branch-free, fully fused.
    """

    def __init__(
        self, model, labels: np.ndarray, ignore_labels=None, **kwargs
    ) -> None:
        import copy as _copy

        self.labels = np.asarray(
            labels.img if hasattr(labels, "img") else labels
        )
        self.unique_labels = [int(l) for l in np.unique(self.labels)]
        self.num_labels = len(self.unique_labels)
        self.ignore_labels = [int(l) for l in (ignore_labels or [])]
        # Accept a per-label dict (reference passes dicts for calibrated
        # models) or a prototype to be copied per label.
        if isinstance(model, dict):
            self.models = {int(k): v for k, v in model.items()}
        else:
            self.models = {
                label: _copy.deepcopy(model) for label in self.unique_labels
            }
        self.num_parameters = sum(
            getattr(m, "num_parameters", 0) for m in self.models.values()
        )

    def call_array(self, signal: jnp.ndarray) -> jnp.ndarray:
        labels = jnp.asarray(self.labels)
        out = None
        for label in self.unique_labels:
            model = self.models.get(label)
            if model is None or label in self.ignore_labels:
                continue
            contribution = jnp.asarray(
                model.call_array(signal), dtype=jnp.float32
            )
            if out is None:
                # Output shape follows the sub-model (may drop the color
                # axis, e.g. kernel interpolation: (H, W, 3) -> (H, W)).
                out = jnp.zeros_like(contribution)
            mask = labels == label
            if mask.ndim < contribution.ndim:
                mask = mask.reshape(
                    mask.shape + (1,) * (contribution.ndim - mask.ndim)
                )
            out = jnp.where(mask, contribution, out)
        if out is None:
            out = jnp.zeros(
                jnp.asarray(signal).shape[: self.labels.ndim],
                dtype=jnp.float32,
            )
        return out

    def __getitem__(self, label):
        return self.models[int(label)]

    def __setitem__(self, label, value):
        self.models[int(label)] = value

    def keys(self):
        return list(self.models.keys())

    def update_model_parameters(self, parameters: np.ndarray, dofs=None) -> None:
        offset = 0
        for label in self.unique_labels:
            model = self.models.get(label)
            if model is None:
                continue
            n = getattr(model, "num_parameters", 0)
            model.update_model_parameters(parameters[offset : offset + n], dofs)
            offset += n
