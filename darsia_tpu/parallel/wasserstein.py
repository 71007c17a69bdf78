"""Batched Wasserstein-1 solves, data-parallel over a device mesh.

The production scaling axis for optimal transport in this framework is the
*batch* of mass-image pairs: the reference's run-comparison workflow
computes W1 between corresponding snapshots of different experiment runs
(reference ``presets/workflows/comparison/comparison_wasserstein.py:109``),
one CPU solve at a time.  Each pair is independent, so on TPU the whole
comparison rides pure data parallelism: the fused Newton solve
(:mod:`darsia_tpu.measure.beckmann`) is ``vmap``-ped over the pair batch
and the batch axis is sharded over the mesh — every chip runs its own
fully fused on-device Newton loop, no cross-chip traffic except the shared
loop predicate.

For single problems too large for one chip, see
:func:`darsia_tpu.parallel.tpfa.sharded_tpfa_cg` (spatial domain
decomposition of the inner pressure solve with ICI halo exchange).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..measure.beckmann import BeckmannNewtonSolver
from ..utils.grid import Grid

__all__ = ["batched_wasserstein", "sharded_wasserstein_batch"]


def _make_single_solve(solver: BeckmannNewtonSolver):
    """Pure traceable (mass_diff) -> (distance, iterations, status) from the
    solver's fused Newton machinery."""
    assert solver._traceable_mobility(), (
        "batched Wasserstein requires a traceable (cell-based) mobility mode"
    )
    inner = solver._fused_step_fn()

    def newton_step(state, rhs):
        fluxes, p = state
        fluxes_new, p_new, metrics = inner(fluxes, p, rhs)
        return (fluxes_new, p_new), metrics

    fused_solve = solver._build_fused_outer(newton_step)
    L_init = float(solver.options.get("L_init", 1.0))

    def one(mass_diff: jnp.ndarray):
        mass_rhs = solver.cell_vol * mass_diff.astype(solver.dtype)
        face_weights = tuple(L_init * w for w in solver.base_face_weights)
        p = jnp.zeros(solver.shape, dtype=solver.dtype)
        p = solver.pressure_solve(face_weights, mass_rhs, p)
        fluxes = solver.flux_from_pressure(face_weights, p)
        distance0 = solver._l1_weighted(tuple(fluxes))
        state, dist, k, status, _ = fused_solve(
            (tuple(fluxes), p), distance0, mass_rhs, 0.0
        )
        return dist, k, status

    return one


def batched_wasserstein(
    grid_shape: tuple,
    voxel_size=1.0,
    weight=None,
    options: Optional[dict] = None,
):
    """Jitted (src_batch, dst_batch) -> (distances, iterations, statuses).

    ``src_batch``/``dst_batch`` have shape ``(B, *grid_shape)``; masses are
    assumed normalized per pair (as in ``wasserstein_distance``).
    """
    solver = BeckmannNewtonSolver(
        Grid(tuple(grid_shape), voxel_size), weight, dict(options or {})
    )
    one = _make_single_solve(solver)

    def batch(src, dst):
        return jax.vmap(lambda s, d: one(d - s))(src, dst)

    return jax.jit(batch)


def sharded_wasserstein_batch(
    mesh: Mesh,
    grid_shape: tuple,
    voxel_size=1.0,
    weight=None,
    options: Optional[dict] = None,
    axis: Optional[str] = None,
):
    """Batch-sharded W1: pairs distributed over the ``axis`` mesh axis.

    Returns ``solve(src_batch, dst_batch) -> distances`` where the leading
    batch dimension is sharded across devices; every device executes the
    fused Newton loop on its local pairs.  ``B`` must be divisible by the
    mesh-axis size.
    """
    axis = axis or mesh.axis_names[0]
    inner = batched_wasserstein(grid_shape, voxel_size, weight, options)
    spec = PartitionSpec(axis, *([None] * len(grid_shape)))
    sharding = NamedSharding(mesh, spec)
    out_sharding = NamedSharding(mesh, PartitionSpec(axis))

    def solve(src_batch, dst_batch):
        src_batch = jax.device_put(jnp.asarray(src_batch), sharding)
        dst_batch = jax.device_put(jnp.asarray(dst_batch), sharding)
        dist, k, status = inner(src_batch, dst_batch)
        return (
            jax.device_put(dist, out_sharding),
            np.asarray(k),
            np.asarray(status),
        )

    return solve
