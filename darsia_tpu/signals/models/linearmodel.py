"""Linear signal models (scaling / affine / per-label heterogeneous).

Parity: reference ``src/darsia/signals/models/linearmodel.py:15-282``.
"""

from __future__ import annotations

from typing import Literal, Optional, Union

import jax.numpy as jnp
import numpy as np

from .basemodel import Model

__all__ = ["ScalingModel", "LinearModel", "HeterogeneousLinearModel"]


class ScalingModel(Model):
    """Plain scaling of the signal."""

    def __init__(self, key: str = "", **kwargs) -> None:
        self._scaling = kwargs.get(key + "scaling", 1.0)
        self.num_parameters = 1
        self.volumes = None

    def update(self, scaling: Optional[float] = None) -> None:
        if scaling is not None:
            self._scaling = scaling

    def update_model_parameters(self, parameters, dofs=None) -> None:
        if dofs is None or dofs == "all" or set(dofs) == {"scaling"}:
            self.update(scaling=parameters[0])
        else:
            raise ValueError(f"Unknown dof {dofs}.")

    def call_array(self, img: jnp.ndarray) -> jnp.ndarray:
        return self._scaling * img


class LinearModel(Model):
    """Affine conversion scaling * signal + offset."""

    def __init__(self, key: str = "", **kwargs) -> None:
        self._scaling = kwargs.get(key + "scaling", 1.0)
        self._offset = kwargs.get(key + "offset", 0.0)
        self.num_parameters = 2
        self.volumes = None

    def update(self, scaling=None, offset=None) -> None:
        if scaling is not None:
            self._scaling = scaling
        if offset is not None:
            self._offset = offset

    def update_model_parameters(self, parameters, dofs=None) -> None:
        if dofs is None or dofs == ["all"] or dofs == "all" or (
            isinstance(dofs, (list, set)) and set(dofs) == {"scaling", "offset"}
        ):
            self.update(scaling=parameters[0], offset=parameters[1])
        elif set(dofs) == {"scaling"}:
            self.update(scaling=parameters[0])
        elif set(dofs) == {"offset"}:
            self.update(offset=parameters[0])
        else:
            raise ValueError(f"Unknown dof {dofs}.")

    def call_array(self, img: jnp.ndarray) -> jnp.ndarray:
        return self._scaling * img + self._offset


class HeterogeneousLinearModel(Model):
    """Per-label affine conversion, applied as fused gathers.

    The per-label scaling/offset maps are materialized once as full fields
    (label lookup), so application is two elementwise ops.
    """

    def __init__(
        self,
        labels: np.ndarray,
        key: str = "",
        **kwargs,
    ) -> None:
        self.labels = np.asarray(labels)
        self.unique_labels = np.unique(self.labels)
        self.num_labels = len(self.unique_labels)
        scaling = kwargs.get(key + "scaling", 1.0)
        offset = kwargs.get(key + "offset", 0.0)
        self._scaling = (
            np.full(self.num_labels, scaling, dtype=float)
            if np.isscalar(scaling)
            else np.asarray(scaling, dtype=float)
        )
        self._offset = (
            np.full(self.num_labels, offset, dtype=float)
            if np.isscalar(offset)
            else np.asarray(offset, dtype=float)
        )
        self.num_parameters = 2 * self.num_labels
        self.volumes = None
        self._fields_dirty = True

    def _fields(self):
        if self._fields_dirty:
            scaling_field = np.zeros(self.labels.shape, dtype=np.float32)
            offset_field = np.zeros(self.labels.shape, dtype=np.float32)
            for i, label in enumerate(self.unique_labels):
                mask = self.labels == label
                scaling_field[mask] = self._scaling[i]
                offset_field[mask] = self._offset[i]
            self._scaling_field = jnp.asarray(scaling_field)
            self._offset_field = jnp.asarray(offset_field)
            self._fields_dirty = False
        return self._scaling_field, self._offset_field

    def update(self, scaling=None, offset=None) -> None:
        if scaling is not None:
            self._scaling = np.asarray(scaling, dtype=float)
        if offset is not None:
            self._offset = np.asarray(offset, dtype=float)
        self._fields_dirty = True

    def update_model_parameters(self, parameters, dofs=None) -> None:
        parameters = np.asarray(parameters)
        if dofs is None or dofs == "all":
            self.update(
                scaling=parameters[: self.num_labels],
                offset=parameters[self.num_labels : 2 * self.num_labels],
            )
        elif set(dofs) == {"scaling"}:
            self.update(scaling=parameters[: self.num_labels])
        elif set(dofs) == {"offset"}:
            self.update(offset=parameters[: self.num_labels])
        else:
            raise ValueError(f"Unknown dof {dofs}.")

    def call_array(self, img: jnp.ndarray) -> jnp.ndarray:
        scaling_field, offset_field = self._fields()
        return scaling_field * img + offset_field
