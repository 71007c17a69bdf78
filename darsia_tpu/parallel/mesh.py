"""Device mesh construction for sharded image analysis.

The reference has no distributed compute (SURVEY §2.12); its intra-node
parallelism axes (patch decomposition, time-series batching) map here onto a
2d device mesh: a ``batch`` axis for the time series (data parallelism over
DCN/ICI) and a ``space`` axis for spatial domain decomposition of a single
image (halo-exchange stencils over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["create_mesh", "batch_sharding"]


def create_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("batch", "space"),
    devices=None,
) -> Mesh:
    """Create a device mesh over the available devices.

    Args:
        mesh_shape: per-axis device counts; defaults to all devices on the
            first axis.
        axis_names: logical axis names (default ("batch", "space")).
        devices: explicit device list (defaults to ``jax.devices()``).

    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(mesh_shape)) == n, (
        f"mesh shape {mesh_shape} incompatible with {n} devices"
    )
    device_array = np.array(devices).reshape(mesh_shape)
    return Mesh(device_array, axis_names)


def batch_sharding(mesh: Mesh, num_spatial_axes: int = 2) -> NamedSharding:
    """Sharding for a batch of images: batch axis + leading spatial axis."""
    axis_names = mesh.axis_names
    spec = [axis_names[0]]
    if len(axis_names) > 1 and mesh.shape[axis_names[1]] > 1:
        spec.append(axis_names[1])
        spec.extend([None] * (num_spatial_axes - 1))
    else:
        spec.extend([None] * num_spatial_axes)
    return NamedSharding(mesh, PartitionSpec(*spec))
