"""Sharded TPFA Poisson solves: domain-decomposed Beckmann pressure systems.

The reference's optimal-transport solvers are single-process (PETSc on one
rank, SURVEY §2.12: no distributed compute).  Here the TPFA operator and
its nullspace-projected Jacobi-CG run over a 1d ``space`` mesh axis via
``shard_map``: each device owns a contiguous row block, matvecs exchange
one halo row over ICI (`ppermute`), and the CG reductions ride `psum`.

This scales the hot pressure solve of
:class:`darsia_tpu.BeckmannNewtonSolver` to meshes larger than one chip's
HBM while producing bitwise-comparable iterates to the single-device
:func:`darsia_tpu.measure.beckmann_kernels.tpfa_cg` (same algorithm, same
projection; reductions are deterministic per mesh shape).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .halo import halo_exchange

__all__ = ["sharded_tpfa_cg", "projected_pcg_local", "local_tpfa_operator"]


def projected_pcg_local(
    A, diag, rhs, axis: str, tol: float, maxiter: int, M=None
):
    """Per-shard body of the nullspace-projected PCG.

    ``A`` is the shard-local operator closure (must already perform its
    halo exchanges); ``diag`` its diagonal for the default Jacobi
    preconditioner — pass ``M`` (a linear SPD closure on the local block)
    to override, e.g. with a two-level coarse-grid correction.
    Reductions ride ``lax.psum`` over ``axis``.  Returns the mean-zero
    solution block.  Runs inside ``shard_map`` — also reused by the
    sharded Beckmann Newton loop, where it is called once per outer
    iteration inside the same program.
    """
    if M is None:
        M = lambda r: r / diag  # noqa: E731 - default Jacobi
    n_total = lax.psum(jnp.array(rhs.size, jnp.float32), axis_name=axis)

    def project(v):
        total = lax.psum(jnp.sum(v), axis_name=axis)
        return v - total / n_total

    b = project(rhs)
    x = jnp.zeros_like(b)
    r = b - A(x)
    z = project(M(r))
    p_vec = z
    rz = lax.psum(jnp.vdot(r, z), axis_name=axis)
    b_norm = jnp.sqrt(
        jnp.maximum(lax.psum(jnp.sum(b * b), axis_name=axis), 1e-30)
    )

    def cond(state):
        _, r, _, rz, k = state
        r_norm = jnp.sqrt(lax.psum(jnp.sum(r * r), axis_name=axis))
        healthy = jnp.logical_and(jnp.isfinite(rz), rz > 1e-28)
        return jnp.logical_and(
            jnp.logical_and(k < maxiter, r_norm > tol * b_norm), healthy
        )

    def body(state):
        x, r, p_vec, rz, k = state
        Ap = A(p_vec)
        pAp = lax.psum(jnp.vdot(p_vec, Ap), axis_name=axis)
        alpha = rz / jnp.maximum(pAp, 1e-30)
        x_new = project(x + alpha * p_vec)
        r_new = r - alpha * Ap
        z = project(M(r_new))
        rz_new = lax.psum(jnp.vdot(r_new, z), axis_name=axis)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        return x_new, r_new, z + beta * p_vec, rz_new, k + 1

    x, _, _, _, _ = lax.while_loop(cond, body, (x, r, p_vec, rz, 0))
    return project(x)


def local_tpfa_operator(trans_rows_p, trans_col, axis: str, num: int):
    """(A, diag) for the shard-local TPFA block given padded row faces.

    ``trans_rows_p[k]`` is the transmissibility of the face ABOVE local
    row ``k`` (shard 0's row 0 is the nonexistent global boundary face and
    is masked).  Consumed by :func:`sharded_tpfa_cg`; the sharded Beckmann
    Newton loop builds its own dimension-generic operator.
    """
    below = lax.ppermute(
        trans_rows_p[:1], axis, [(i, (i - 1) % num) for i in range(num)]
    )
    trans_row_ext = jnp.concatenate([trans_rows_p, below], axis=0)

    def A(p):
        p_ext = halo_exchange(p, 1, axis, axis=0)
        return _local_tpfa_apply(p_ext, trans_row_ext, trans_col, axis)

    local_rows = trans_rows_p.shape[0]
    idx = lax.axis_index(axis)
    row_ids = lax.broadcasted_iota(
        jnp.int32, (local_rows, trans_rows_p.shape[1]), 0
    )
    diag_col = jnp.zeros_like(trans_rows_p)
    diag_col = diag_col.at[:, :-1].add(trans_col)
    diag_col = diag_col.at[:, 1:].add(trans_col)
    t_up = jnp.where(
        jnp.logical_and(idx == 0, row_ids == 0), 0.0, trans_row_ext[:-1]
    )
    t_down = jnp.where(
        jnp.logical_and(idx == num - 1, row_ids == local_rows - 1),
        0.0,
        trans_row_ext[1:],
    )
    diag = jnp.maximum(diag_col + t_up + t_down, 1e-30)
    return A, diag


def _local_tpfa_apply(p_ext, trans_row_ext, trans_col, axis_name):
    """A p on one shard, using a 1-row halo-extended pressure block.

    Args:
        p_ext: (local_rows + 2, W) halo-extended pressure.
        trans_row_ext: (local_rows + 1, W) row-face transmissibilities,
            including the face to the upper neighbour (global faces are
            sliced per shard outside).
        trans_col: (local_rows, W - 1) column-face transmissibilities.
    """
    idx = lax.axis_index(axis_name)
    num = lax.axis_size(axis_name)
    inner = p_ext[1:-1]
    out = jnp.zeros_like(inner)

    # Row-direction fluxes: faces between consecutive rows of the extended
    # block. Face k sits between p_ext[k] and p_ext[k+1].
    diff_up = inner - p_ext[:-2]  # with row above
    diff_down = inner - p_ext[2:]  # with row below
    t_up = trans_row_ext[:-1]
    t_down = trans_row_ext[1:]
    # Global boundary faces do not exist: mask first face of shard 0 and
    # last face of the last shard.
    rows = inner.shape[0]
    row_ids = lax.broadcasted_iota(jnp.int32, inner.shape, 0)
    first_global = jnp.logical_and(idx == 0, row_ids == 0)
    last_global = jnp.logical_and(idx == num - 1, row_ids == rows - 1)
    out = out + jnp.where(first_global, 0.0, t_up * diff_up)
    out = out + jnp.where(last_global, 0.0, t_down * diff_down)

    # Column-direction fluxes are shard-local; face flux t*(p_j - p_{j+1})
    # enters cell j positively and cell j+1 negatively (reference
    # beckmann_kernels.tpfa_apply convention).
    flux = trans_col * (inner[:, :-1] - inner[:, 1:])
    out = out.at[:, :-1].add(flux)
    out = out.at[:, 1:].add(-flux)
    return out


def sharded_tpfa_cg(
    mesh: Mesh,
    shape: tuple,
    axis: str = "space",
    tol: float = 1e-6,
    maxiter: int = 500,
):
    """Build a sharded CG solve for the pure-Neumann TPFA system.

    Returns a jitted callable ``solve(trans_rows, trans_cols, rhs) -> p``
    where ``trans_rows`` has shape (H-1, W), ``trans_cols`` (H, W-1),
    ``rhs`` (H, W); all sharded over rows.  H must be divisible by the
    mesh axis size.
    """
    H, W = shape
    num = mesh.shape[axis]
    assert H % num == 0, "Rows must divide the space mesh axis."
    local_rows = H // num

    def per_shard(trans_rows_p, trans_col, rhs):
        # trans_rows_p: (local_rows, W) — padded global row faces, entry k
        # is the face ABOVE local row k (global face r-1/2); the pad row 0
        # of shard 0 is zero (no boundary face).
        A, diag = local_tpfa_operator(trans_rows_p, trans_col, axis, num)
        return projected_pcg_local(A, diag, rhs, axis, tol, maxiter)

    sharded = jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None)),
            out_specs=P(axis, None),
        )
    )

    def solve(trans_rows, trans_cols, rhs):
        # Pad the (H-1, W) row faces to (H, W): entry k = face above row k.
        trans_rows_p = jnp.concatenate(
            [jnp.zeros((1, W), trans_rows.dtype), jnp.asarray(trans_rows)],
            axis=0,
        )
        return sharded(
            jnp.asarray(trans_rows_p), jnp.asarray(trans_cols), jnp.asarray(rhs)
        )

    return solve
