"""Spatially-sharded Beckmann Newton solve (domain-decomposed W1).

The batch-sharded path (:mod:`darsia_tpu.parallel.wasserstein`) gives every
chip its own full problem; this module shards ONE problem's rows over the
``space`` mesh axis so images larger than a single chip's HBM can be
solved.  The entire Newton iteration — cell transport density, harmonic
mobility averaging, the nullspace-projected Jacobi-PCG pressure solve,
the flux update, and all convergence metrics — runs inside one
``shard_map`` program: cell/face stencils touch one halo row over ICI
(``ppermute``), scalars ride ``psum``/``pmax``.

Math matches the single-device :class:`darsia_tpu.BeckmannNewtonSolver`
with ``mobility_mode=cell_based`` and ``l1_mode=constant_cell_projection``
(reference beckmann_newton_solver.py solved via per-axis face stencils):
the sharded distance agrees with the unsharded solve to solver tolerance
(asserted in tests and the driver dryrun).

Shard-local layout (rows sharded, ``R = H / mesh.shape[axis]`` rows each):

- ``u_row_p``: (R, W) — row-normal flux on the face ABOVE each local cell
  row.  Shard 0's row 0 is the nonexistent global boundary face and is
  pinned to zero.
- ``u_col``: (R, W-1) — shard-local column faces.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .tpfa import local_tpfa_operator, projected_pcg_local

__all__ = ["sharded_beckmann_newton"]


def _anderson_mix_sharded(state, gk, fk, axis: str, reg: float = 1e-5):
    """One Anderson(depth) type-II mixing step with row-sharded history.

    The history buffers hold each shard's LOCAL flat flux block; the
    depth x depth normal equations are assembled with ``psum`` so every
    shard solves the identical (tiny) ridge system.  Mirrors the
    single-device :func:`darsia_tpu.utils.andersonacceleration.anderson_mix`
    (QR there, ridge normal equations here — equivalent at this
    regularization level).
    """
    depth = state["F"].shape[0]
    it = state["iteration"]
    first = it == 0
    col = (it - 1) % depth
    F = state["F"].at[col].set(fk - state["fkm1"])
    G = state["G"].at[col].set(gk - state["gkm1"])

    gram = lax.psum(F @ F.T, axis_name=axis)
    rhs = lax.psum(F @ fk, axis_name=axis)
    lam = reg * jnp.sqrt(jnp.maximum(jnp.max(jnp.diag(gram)), 1e-30))
    gamma = jnp.linalg.solve(
        gram + (lam**2 + 1e-30) * jnp.eye(depth, dtype=F.dtype), rhs
    )
    mixed = gk - G.T @ gamma

    x_next = jnp.where(first, gk, mixed)
    zero = jnp.zeros((), dtype=F.dtype)
    state_next = {
        "F": jnp.where(first, zero, F),
        "G": jnp.where(first, zero, G),
        "fkm1": fk,
        "gkm1": gk,
        "iteration": state["iteration"] + 1,
    }
    return state_next, x_next


def sharded_beckmann_newton(
    mesh: Mesh,
    shape: tuple,
    voxel_size=1.0,
    axis: str = "space",
    num_iter: int = 100,
    tol_increment: float = 1e-4,
    tol_distance: float = 1e-4,
    cg_tol: float = 1e-6,
    cg_maxiter: int = 500,
    regularization: Optional[float] = None,
    aa_depth: int = 0,
    weight=None,
):
    """Build a sharded W1 solve ``solve(mass_diff) -> (distance, p, k)``.

    ``mass_diff`` is the (H, W) signed mass difference (source minus
    destination, already normalized to equal total mass); the returned
    ``distance`` is the converged W1 value (replicated scalar), ``p`` the
    Kantorovich-type pressure (sharded over rows), ``k`` the iteration
    count.  ``H`` must divide the mesh axis size.  ``weight`` is an
    optional (H, W) cell weight field (heterogeneous metric, sharded with
    the rows; matches the single-device ``cell_weights``).  ``aa_depth > 0``
    enables in-loop Anderson mixing of the flux iterate (sharded history
    buffers, psum-assembled normal equations) — typically several times
    fewer Newton iterations, matching the single-device solver's
    ``aa_depth`` option.
    """
    H, W = shape
    num = mesh.shape[axis]
    assert H % num == 0, "Rows must divide the space mesh axis."
    local_rows = H // num
    hy, hx = (
        (float(voxel_size), float(voxel_size))
        if np.isscalar(voxel_size)
        else (float(voxel_size[0]), float(voxel_size[1]))
    )
    cell_vol = hy * hx
    face_vol_row = hx  # row-normal faces
    face_vol_col = hy  # column-normal faces
    reg = float(regularization) if regularization is not None else float(
        np.finfo(np.float32).eps
    )

    fwd = [(i, (i + 1) % num) for i in range(num)]  # send to next shard
    bwd = [(i, (i - 1) % num) for i in range(num)]  # send to previous shard

    def per_shard(mass_diff, cell_weight):
        idx = lax.axis_index(axis)
        row_ids = lax.broadcasted_iota(jnp.float32, (local_rows, W), 0)
        # Mask for the padded (nonexistent) global top face on shard 0.
        pad_face = jnp.logical_and(idx == 0, row_ids == 0)

        mass_rhs = cell_vol * mass_diff

        def row_face_below(u_row_p):
            """Row flux on the face BELOW each local row (next row's
            'above' face; zero on the global bottom boundary)."""
            nxt = lax.ppermute(u_row_p[:1], axis, bwd)
            below = jnp.concatenate([u_row_p[1:], nxt], axis=0)
            last_global = jnp.logical_and(
                idx == num - 1, row_ids == local_rows - 1
            )
            return jnp.where(last_global, 0.0, below)

        def transport_density(u_row_p, u_col):
            """|weight * RT0 flux| at the cell center (constant cell
            projection; weighted metric like the single-device solver)."""
            u_above = jnp.where(pad_face, 0.0, u_row_p)
            comp_row = 0.5 * (u_above + row_face_below(u_row_p))
            left = jnp.pad(u_col, ((0, 0), (1, 0)))
            right = jnp.pad(u_col, ((0, 0), (0, 1)))
            comp_col = 0.5 * (left + right)
            return cell_weight * jnp.sqrt(comp_row**2 + comp_col**2)

        def face_weights(rho):
            """1 / harmonic-face-average of rho (cell-based mobility)."""
            floor = jnp.maximum(
                reg, 1e-6 * lax.pmax(jnp.max(rho), axis_name=axis)
            )
            cell_inv = jnp.maximum(rho, floor) / cell_weight**2
            # Column faces: shard-local harmonic mean.
            a, b = cell_inv[:, :-1], cell_inv[:, 1:]
            inv_col = 2.0 * a * b / jnp.maximum(a + b, 1e-30)
            fw_col = 1.0 / jnp.maximum(inv_col, 1e-30)
            # Row faces (above each local row): previous shard's last cell
            # row pairs with this shard's first.
            prev_last = lax.ppermute(cell_inv[-1:], axis, fwd)
            above_cells = jnp.concatenate([prev_last, cell_inv[:-1]], axis=0)
            inv_row = (
                2.0
                * above_cells
                * cell_inv
                / jnp.maximum(above_cells + cell_inv, 1e-30)
            )
            fw_row_p = 1.0 / jnp.maximum(inv_row, 1e-30)
            fw_row_p = jnp.where(pad_face, 1.0, fw_row_p)
            return fw_row_p, fw_col

        def flux_from_pressure(fw_row_p, fw_col, p):
            prev_last = lax.ppermute(p[-1:], axis, fwd)
            p_above = jnp.concatenate([prev_last, p[:-1]], axis=0)
            grad_row = face_vol_row * (p_above - p)
            u_row_p = jnp.where(
                pad_face, 0.0, grad_row / (fw_row_p * cell_vol)
            )
            grad_col = face_vol_col * (p[:, :-1] - p[:, 1:])
            u_col = grad_col / (fw_col * cell_vol)
            return u_row_p, u_col

        num_row = local_rows * W
        def flatten(u_row_p, u_col):
            return jnp.concatenate([u_row_p.reshape(-1), u_col.reshape(-1)])

        def unflatten(flat):
            u_row_p = flat[:num_row].reshape(local_rows, W)
            u_col = flat[num_row:].reshape(local_rows, W - 1)
            return jnp.where(pad_face, 0.0, u_row_p), u_col

        def newton_step(state):
            u_row_p, u_col, _, dist_prev, k, _, aa_state = state
            rho = transport_density(u_row_p, u_col)
            fw_row_p, fw_col = face_weights(rho)
            trans_rows_p = jnp.where(
                pad_face,
                0.0,
                face_vol_row**2 / (fw_row_p * cell_vol),
            )
            trans_col = face_vol_col**2 / (fw_col * cell_vol)
            A, diag = local_tpfa_operator(trans_rows_p, trans_col, axis, num)
            p = projected_pcg_local(
                A, diag, mass_rhs, axis, cg_tol, cg_maxiter
            )
            u_row_new, u_col_new = flux_from_pressure(fw_row_p, fw_col, p)

            if aa_depth > 0:
                xk = flatten(u_row_p, u_col)
                gk = flatten(u_row_new, u_col_new)
                aa_state, mixed = _anderson_mix_sharded(
                    aa_state, gk, gk - xk, axis
                )
                u_row_new, u_col_new = unflatten(mixed)

            rho_new = transport_density(u_row_new, u_col_new)
            distance = cell_vol * lax.psum(jnp.sum(rho_new), axis_name=axis)
            inc_sq = lax.psum(
                jnp.sum((u_row_new - u_row_p) ** 2)
                + jnp.sum((u_col_new - u_col) ** 2),
                axis_name=axis,
            )
            norm_sq = lax.psum(
                jnp.sum(u_row_new**2) + jnp.sum(u_col_new**2),
                axis_name=axis,
            )
            rel_inc = jnp.sqrt(inc_sq / jnp.maximum(norm_sq, 1e-30))
            rel_dist = jnp.abs(distance - dist_prev) / jnp.maximum(
                distance, 1e-30
            )
            converged = jnp.logical_and(
                rel_inc < tol_increment, rel_dist < tol_distance
            )
            return u_row_new, u_col_new, p, distance, k + 1, converged, aa_state

        def cond(state):
            k, converged = state[4], state[5]
            return jnp.logical_and(k < num_iter, jnp.logical_not(converged))

        # Derive the carries from the (device-varying) input so the
        # while_loop's varying-manual-axes types match across iterations.
        flat_size = num_row + local_rows * (W - 1)
        zero_flat = jnp.zeros_like(mass_diff, shape=(flat_size,))
        aa_init = {
            "F": jnp.zeros_like(mass_diff, shape=(max(aa_depth, 1), flat_size)),
            "G": jnp.zeros_like(mass_diff, shape=(max(aa_depth, 1), flat_size)),
            "fkm1": zero_flat,
            "gkm1": zero_flat,
            "iteration": jnp.array(0, jnp.int32),
        }
        init = (
            jnp.zeros_like(mass_diff),
            jnp.zeros_like(mass_diff[:, :-1]),
            jnp.zeros_like(mass_diff),
            jnp.array(jnp.inf, mass_diff.dtype),
            jnp.array(0, jnp.int32),
            jnp.array(False),
            aa_init,
        )
        _, _, p, distance, k, _, _ = lax.while_loop(cond, newton_step, init)
        return distance, p, k

    sharded = jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None)),
            out_specs=(P(), P(axis, None), P()),
        )
    )

    if weight is None:
        weight_field = np.ones((H, W), np.float32)
    else:
        weight_field = np.asarray(
            weight.img if hasattr(weight, "img") else weight, np.float32
        )
        assert weight_field.shape == (H, W)

    def solve(mass_diff):
        return sharded(
            jnp.asarray(mass_diff, jnp.float32), jnp.asarray(weight_field)
        )

    return solve
