"""Spatially sharded warps: domain-decomposed resampling over a 2d mesh.

SURVEY §2.12 maps the reference's patch decomposition
(``src/darsia/image/patches.py``, host-side numpy block loops) onto spatial
domain decomposition over the device mesh.  A warp with a bounded
displacement field is local up to a ``max_disp`` halo: each device owns one
(rows, cols) tile of the OUTPUT image, receives a ``max_disp``-wide halo of
the input from its mesh neighbours (corner-correct, two ``ppermute``
sweeps), and resamples its tile entirely in VMEM-resident local arrays.

This scales the hot correction/registration warps
(:mod:`darsia_tpu.ops.warp`) to images larger than one chip's HBM, with
bitwise-equal results to the single-device ``warp`` away from floating-
point reassociation (same bilinear arithmetic, same zero fill outside the
global domain).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.warp import warp
from .halo import halo_exchange_2d

__all__ = ["sharded_warp"]


def sharded_warp(
    mesh: Mesh,
    image_shape: tuple,
    max_disp: int,
    row_axis: str = "rows",
    col_axis: str = "cols",
    order: int = 1,
    cval: float = 0.0,
):
    """Build a jitted sharded warp over a (rows, cols) space mesh.

    Args:
        mesh: device mesh containing ``row_axis`` and ``col_axis``.
        image_shape: global (H, W); both must divide the mesh axis sizes.
        max_disp: static bound on |coords - identity| (halo width).
        order: interpolation order (0 or 1, as in :func:`darsia_tpu.ops.warp.warp`).
        cval: fill value outside the global domain.

    Returns:
        ``apply(data, coords) -> warped`` taking the GLOBAL (H, W[, C])
        image and (2, H, W) pull-back coordinate field (both shardable over
        the space mesh) and returning the warped global image.
    """
    H, W = image_shape
    pr, pc = mesh.shape[row_axis], mesh.shape[col_axis]
    assert H % pr == 0 and W % pc == 0, (
        f"image {image_shape} must tile the ({pr}, {pc}) space mesh"
    )
    lh, lw = H // pr, W // pc
    D = int(max_disp)
    assert D < min(lh, lw), (
        "halo width must be smaller than the local tile; use a coarser mesh"
    )

    def per_shard(img_local, coords_local):
        # Halo-extend the local INPUT tile; channels ride along unsharded.
        ext = halo_exchange_2d(img_local, D, row_axis, col_axis)

        # Global origin of this tile: the extended block covers global
        # positions [i0 - D, i0 + lh + D) x [j0 - D, j0 + lw + D).
        i0 = (lax.axis_index(row_axis) * lh).astype(coords_local.dtype)
        j0 = (lax.axis_index(col_axis) * lw).astype(coords_local.dtype)

        # |coords - identity| <= D keeps every clamped sample inside the
        # extended block; clamping first reproduces the single-device
        # bilinear arithmetic, the validity mask the zero fill.
        rows = jnp.clip(coords_local[0], 0.0, float(H - 1))
        cols = jnp.clip(coords_local[1], 0.0, float(W - 1))
        local_coords = jnp.stack([rows - (i0 - D), cols - (j0 - D)])
        out = warp(ext, local_coords, order=order, mode="constant", cval=cval)

        valid = (
            (coords_local[0] >= 0)
            & (coords_local[0] <= H - 1)
            & (coords_local[1] >= 0)
            & (coords_local[1] <= W - 1)
        )
        if out.ndim == 3:
            valid = valid[..., None]
        return jnp.where(valid, out, cval)

    def build(extra_dims: int):
        space = (P(row_axis, col_axis) if extra_dims == 0
                 else P(row_axis, col_axis, *([None] * extra_dims)))
        return jax.jit(
            jax.shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(space, P(None, row_axis, col_axis)),
                out_specs=space,
            )
        )

    fns = {0: build(0), 1: build(1)}

    def apply(data: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        extra = data.ndim - 2
        assert extra in fns, "data must be (H, W) or (H, W, C)"
        return fns[extra](
            jnp.asarray(data, jnp.float32), jnp.asarray(coords, jnp.float32)
        )

    return apply
