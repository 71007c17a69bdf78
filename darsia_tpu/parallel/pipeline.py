"""Sharded analysis pipelines (shard_map over batch x space meshes).

The production hot loop — per-image correction + restoration + signal
conversion over a time series — as one SPMD program:

* the time-series **batch** axis is data-parallel across the ``batch`` mesh
  axis (SURVEY §2.12: the reference streams images one by one on CPU);
* each image's leading **spatial** axis is domain-decomposed across the
  ``space`` mesh axis; the TVD/diffusion stencils exchange halos over ICI
  (:func:`darsia_tpu.parallel.halo.halo_exchange`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec
from jax import shard_map

from .halo import halo_exchange, halo_exchange_2d

__all__ = ["sharded_tvd", "sharded_tvd_2d", "sharded_analysis_step"]


def _laplacian5(x: jnp.ndarray) -> jnp.ndarray:
    """5-point Laplacian with edge-replicated closure (2d)."""
    up = jnp.concatenate([x[:1], x[:-1]], axis=0)
    down = jnp.concatenate([x[1:], x[-1:]], axis=0)
    left = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    right = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    return up + down + left + right - 4.0 * x


def _local_smooth_sweeps(
    x0: jnp.ndarray,
    signal: jnp.ndarray,
    mu: float,
    omega: float,
    iters: int,
    axis_name: Optional[str],
) -> jnp.ndarray:
    """Damped-Jacobi sweeps of (omega*x - ell*Lap x = omega*signal).

    With an axis name bound (inside shard_map), each sweep refreshes a
    1-row halo from the mesh neighbours before applying the stencil.
    """
    ell = 2.0 * mu
    diag = omega + ell * 4.0
    halo = 1

    def sweep(_, x):
        if axis_name is not None:
            x_ext = halo_exchange(x, halo, axis_name, axis=0)
            s_ext = halo_exchange(signal, halo, axis_name, axis=0)
        else:
            x_ext, s_ext = x, signal
        residual = omega * s_ext - (omega * x_ext - ell * _laplacian5(x_ext))
        x_new = x_ext + 0.8 * residual / diag
        if axis_name is not None:
            x_new = lax.slice_in_dim(x_new, halo, x_new.shape[0] - halo, axis=0)
        return x_new

    return lax.fori_loop(0, iters, sweep, x0)


def _local_smooth_sweeps_2d(
    x0: jnp.ndarray,
    signal: jnp.ndarray,
    mu: float,
    omega: float,
    iters: int,
    row_axis: str,
    col_axis: str,
) -> jnp.ndarray:
    """2-D-decomposed damped-Jacobi sweeps: corner-correct halos from both
    mesh axes refresh before every stencil application."""
    ell = 2.0 * mu
    diag = omega + ell * 4.0
    halo = 1

    def sweep(_, x):
        x_ext = halo_exchange_2d(x, halo, row_axis, col_axis)
        s_ext = halo_exchange_2d(signal, halo, row_axis, col_axis)
        residual = omega * s_ext - (omega * x_ext - ell * _laplacian5(x_ext))
        x_new = x_ext + 0.8 * residual / diag
        return x_new[halo:-halo, halo:-halo]

    return lax.fori_loop(0, iters, sweep, x0)


def sharded_tvd_2d(
    mesh: Mesh,
    mu: float = 0.1,
    omega: float = 1.0,
    iters: int = 10,
    row_axis: str = "rows",
    col_axis: str = "cols",
):
    """Single-image smoother over a 2-D (rows, cols) space mesh.

    The full 2-D domain decomposition of one large image: each device owns
    an (H/pr, W/pc) tile, halos (incl. corners) ride ICI per sweep.
    Returns a jitted ``(H, W) -> (H, W)`` callable.
    """
    spec = PartitionSpec(row_axis, col_axis)

    def per_shard(img_local: jnp.ndarray) -> jnp.ndarray:
        return _local_smooth_sweeps_2d(
            img_local, img_local, mu, omega, iters, row_axis, col_axis
        )

    return jax.jit(
        shard_map(per_shard, mesh=mesh, in_specs=(spec,), out_specs=spec)
    )


def sharded_tvd(mesh: Mesh, mu: float = 0.1, omega: float = 1.0, iters: int = 10):
    """Sharded H1/TVD-style smoother: (B, H, W) -> (B, H, W).

    Batch axis sharded over ``batch``, rows over ``space`` (halo exchange
    per sweep over ICI).
    """
    axis_names = mesh.axis_names
    space_axis = (
        axis_names[1]
        if len(axis_names) > 1 and mesh.shape[axis_names[1]] > 1
        else None
    )
    spec = PartitionSpec(axis_names[0], space_axis, None)

    def per_shard(batch_local: jnp.ndarray) -> jnp.ndarray:
        def one(signal):
            return _local_smooth_sweeps(
                signal, signal, mu, omega, iters, axis_name=space_axis
            )

        return jax.vmap(one)(batch_local)

    fn = shard_map(
        per_shard, mesh=mesh, in_specs=(spec,), out_specs=spec
    )
    return jax.jit(fn)


def sharded_analysis_step(
    mesh: Mesh,
    balance_matrix: jnp.ndarray,
    scaling: float = 1.0,
    tvd_iters: int = 10,
    mu: float = 0.1,
):
    """Full sharded per-image analysis step.

    Pipeline per (sharded) image batch vs a (sharded-by-space, replicated-
    by-batch) baseline: color balance (matmul) -> positive diff ->
    monochromatic reduction -> halo-exchanged smoothing -> linear model.

    Returns a jitted function (batch (B, H, W, 3), base (H, W, 3)) ->
    concentration (B, H, W).
    """
    axis_names = mesh.axis_names
    space_axis = (
        axis_names[1]
        if len(axis_names) > 1 and mesh.shape[axis_names[1]] > 1
        else None
    )
    data_spec = PartitionSpec(axis_names[0], space_axis, None, None)
    base_spec = PartitionSpec(space_axis, None, None)
    out_spec = PartitionSpec(axis_names[0], space_axis, None)
    gray = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)

    def per_shard(batch_local: jnp.ndarray, base_local: jnp.ndarray):
        balanced = jnp.einsum(
            "bhwc,cd->bhwd", batch_local.astype(jnp.float32), balance_matrix
        )
        base_balanced = jnp.einsum(
            "hwc,cd->hwd", base_local.astype(jnp.float32), balance_matrix
        )
        diff = jnp.clip(balanced - base_balanced[None], 0.0, None)
        signal = jnp.tensordot(diff, gray, axes=([-1], [0]))

        def smooth(sig):
            return _local_smooth_sweeps(
                sig, sig, mu, 1.0, tvd_iters, axis_name=space_axis
            )

        restored = jax.vmap(smooth)(signal)
        return scaling * restored

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(data_spec, base_spec),
        out_specs=out_spec,
    )
    return jax.jit(fn)
