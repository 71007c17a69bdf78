"""Spatially-sharded Beckmann Newton solve (domain-decomposed W1).

The batch-sharded path (:mod:`darsia_tpu.parallel.wasserstein`) gives every
chip its own full problem; this module shards ONE problem's leading axis
over the ``space`` mesh axis so mass images larger than a single chip's
HBM can be solved — 2-D and 3-D (the reference's PET/DICOM OT comparisons
are 3-D).  The entire Newton iteration — cell transport density, harmonic
mobility averaging, the nullspace-projected Jacobi-PCG pressure solve, the
flux update, optional Anderson mixing, and all convergence metrics — runs
inside one ``shard_map`` program: stencils touch one halo slab over ICI
(``ppermute``), scalars ride ``psum``/``pmax``.

Math matches the single-device :class:`darsia_tpu.BeckmannNewtonSolver`
with ``mobility_mode=cell_based`` and ``l1_mode=constant_cell_projection``
(asserted in tests and the driver dryrun).  The interior (non-sharded)
axes reuse the single-device TPFA stencil
(:func:`darsia_tpu.measure.beckmann_kernels.tpfa_apply` with the sharded
axis zeroed); only the leading axis carries halo terms.

Shard-local layout (leading axis sharded, ``R = shape[0] / num`` slabs):

- ``u0_p``: (R, *rest) — axis-0 flux on the face ABOVE each local slab.
  Shard 0's slab 0 is the nonexistent global boundary face, pinned to 0.
- ``u_rest[k]``: local interior faces along axis ``k+1``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..measure import beckmann_kernels as bk
from .halo import halo_exchange
from .tpfa import projected_pcg_local

__all__ = ["sharded_beckmann_newton"]


def _anderson_mix_sharded(state, gk, fk, axis: str, reg: float = 1e-5):
    """One Anderson(depth) type-II mixing step with sharded history.

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


def _pad_axis(arr, axis: int, before: int, after: int):
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (before, after)
    return jnp.pad(arr, pads)


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
    precond: str = "jacobi",
):
    """Build a sharded W1 solve ``solve(mass_diff) -> (distance, p, k)``.

    ``mass_diff`` is the signed mass difference on ``shape`` (2-D or 3-D;
    destination minus source by the facade's convention, already
    normalized to equal total mass); the returned ``distance`` is the
    converged W1 value (replicated scalar), ``p`` the Kantorovich-type
    pressure (sharded over the leading axis), ``k`` the iteration count.
    ``shape[0]`` must divide the mesh axis size.  ``weight`` is an
    optional cell weight field (heterogeneous metric, sharded with the
    leading axis; matches the single-device ``cell_weights``).
    ``aa_depth > 0`` enables in-loop Anderson mixing of the flux iterate
    (sharded history buffers, psum-assembled normal equations) —
    typically several times fewer Newton iterations, matching the
    single-device solver's ``aa_depth`` option.

    ``precond="two_level"`` augments the inner CG's Jacobi preconditioner
    with a coarse-grid correction: the transmissibilities are Galerkin-
    coarsened locally (2x per level, aggregates never straddle shards),
    the small coarse problem is all-gathered and a geometric-MG V-cycle
    runs redundantly on every device — the domain-decomposition analogue
    of the single-device MG-PCG, keeping inner iteration counts roughly
    grid-independent on large sharded meshes.
    """
    shape = tuple(int(s) for s in shape)
    dim = len(shape)
    assert dim in (2, 3), "sharded_beckmann_newton supports 2-D and 3-D."
    num = mesh.shape[axis]
    assert shape[0] % num == 0, "Leading axis must divide the mesh axis."
    local0 = shape[0] // num
    rest = shape[1:]
    local_shape = (local0,) + rest

    voxel = (
        np.full(dim, float(voxel_size))
        if np.isscalar(voxel_size)
        else np.asarray(voxel_size, dtype=float)
    )
    assert voxel.shape == (dim,)
    cell_vol = float(np.prod(voxel))
    face_vol = [float(np.prod(np.delete(voxel, d))) for d in range(dim)]
    reg = float(regularization) if regularization is not None else float(
        np.finfo(np.float32).eps
    )

    fwd = [(i, (i + 1) % num) for i in range(num)]  # send to next shard
    bwd = [(i, (i - 1) % num) for i in range(num)]  # send to previous shard

    if precond not in ("jacobi", "two_level"):
        raise ValueError(
            f"Unknown precond {precond!r}; use 'jacobi' or 'two_level'."
        )
    # Two-level preconditioner: number of LOCAL 2x coarsening levels
    # (aggregates must not straddle shards; interior axes stay >= 8).
    local_levels = 0
    if precond == "two_level":
        l0, rest_min = local0, min(rest)
        while (
            local_levels < 3
            and l0 % 2 == 0
            and l0 >= 2
            and rest_min % 2 == 0
            and rest_min >= 16
        ):
            l0 //= 2
            rest_min //= 2
            local_levels += 1
        if local_levels == 0:
            import warnings

            warnings.warn(
                "precond='two_level' admits no local coarsening for shape "
                f"{shape} over {num} shards (leading local extent {local0}, "
                f"min interior extent {min(rest)}); falling back to Jacobi. "
                "Tighten cg_maxiter with care.",
                stacklevel=2,
            )
    use_coarse = local_levels > 0

    rest_faces_shapes = [
        (local0,)
        + tuple(n - 1 if k == j else n for j, n in enumerate(rest))
        for k in range(dim - 1)
    ]

    def per_shard(mass_diff, cell_weight):
        idx = lax.axis_index(axis)
        slab_ids = lax.broadcasted_iota(jnp.float32, local_shape, 0)
        # Mask for the padded (nonexistent) global top face on shard 0.
        pad_face = jnp.logical_and(idx == 0, slab_ids == 0)
        last_global = jnp.logical_and(
            idx == num - 1, slab_ids == local0 - 1
        )

        mass_rhs = cell_vol * mass_diff

        def face_below(u0_p):
            """Axis-0 flux on the face BELOW each local slab (next slab's
            'above' face; zero on the global bottom boundary)."""
            nxt = lax.ppermute(u0_p[:1], axis, bwd)
            below = jnp.concatenate([u0_p[1:], nxt], axis=0)
            return jnp.where(last_global, 0.0, below)

        def transport_density(u0_p, u_rest):
            """|weight * RT0 flux| at the cell center (constant cell
            projection; weighted metric like the single-device solver)."""
            u_above = jnp.where(pad_face, 0.0, u0_p)
            comp_sq = (0.5 * (u_above + face_below(u0_p))) ** 2
            for k, u in enumerate(u_rest):
                ax = k + 1
                comp = 0.5 * (
                    _pad_axis(u, ax, 1, 0) + _pad_axis(u, ax, 0, 1)
                )
                comp_sq = comp_sq + comp**2
            return cell_weight * jnp.sqrt(comp_sq)

        def face_weights(rho):
            """1 / harmonic-face-average of rho/cw^2 (cell-based mobility)."""
            floor = jnp.maximum(
                reg, 1e-6 * lax.pmax(jnp.max(rho), axis_name=axis)
            )
            cell_inv = jnp.maximum(rho, floor) / cell_weight**2
            fw_rest = []
            for k in range(dim - 1):
                ax = k + 1
                n = cell_inv.shape[ax]
                a = lax.slice_in_dim(cell_inv, 0, n - 1, axis=ax)
                b = lax.slice_in_dim(cell_inv, 1, n, axis=ax)
                inv = 2.0 * a * b / jnp.maximum(a + b, 1e-30)
                fw_rest.append(1.0 / jnp.maximum(inv, 1e-30))
            # Axis-0 faces (above each local slab): previous shard's last
            # cell slab pairs with this shard's first.
            prev_last = lax.ppermute(cell_inv[-1:], axis, fwd)
            above_cells = jnp.concatenate([prev_last, cell_inv[:-1]], axis=0)
            inv0 = (
                2.0
                * above_cells
                * cell_inv
                / jnp.maximum(above_cells + cell_inv, 1e-30)
            )
            fw0_p = jnp.where(pad_face, 1.0, 1.0 / jnp.maximum(inv0, 1e-30))
            return fw0_p, tuple(fw_rest)

        def coarsen_local(trans0_p, trans_rest):
            """One local 2x Galerkin coarsening in the padded layout.

            Coarse axis-0 faces live at even padded slots (the pad stays
            the pad); interior-axis faces coarsen like the single-device
            :func:`beckmann_kernels.tpfa_coarsen_trans`, with the axis-0
            transverse pair-sum shard-local (aggregates never straddle
            shards since ``local0`` is even at every retained level).
            """
            t0 = trans0_p[::2]
            for e in range(1, dim):
                t0 = bk._pair_sum(t0, e)
            rest_c = []
            for k in range(dim - 1):
                ax = k + 1
                t = trans_rest[k]
                t = lax.slice_in_dim(t, 1, t.shape[ax], stride=2, axis=ax)
                for e in range(dim):
                    if e != ax:
                        t = bk._pair_sum(t, e)
                rest_c.append(t)
            return t0, tuple(rest_c)

        def coarse_preconditioner(trans0_p, trans_rest, diag):
            """Additive Jacobi + gathered coarse V-cycle correction."""
            t0_c, rest_c = trans0_p, trans_rest
            for _ in range(local_levels):
                t0_c, rest_c = coarsen_local(t0_c, rest_c)
            local0_c = t0_c.shape[0]
            # Standard-layout global coarse trans: concatenated padded
            # slots minus shard 0's pad slot = all interior faces.
            t0_g = lax.all_gather(t0_c, axis, axis=0, tiled=True)[1:]
            rest_g = tuple(
                lax.all_gather(t, axis, axis=0, tiled=True) for t in rest_c
            )
            coarse_shape = (local0_c * num,) + tuple(
                n // 2**local_levels for n in rest
            )
            levels = bk.tpfa_mg_levels(coarse_shape)
            trans_levels = [(t0_g, *rest_g)]
            for _ in range(levels - 1):
                trans_levels.append(
                    bk.tpfa_coarsen_trans(trans_levels[-1], dim)
                )
            diag_levels = [bk._tpfa_diag(t, dim) for t in trans_levels]

            def M(r):
                rc = r
                for _ in range(local_levels):
                    rc = bk._restrict_cells(rc, dim)
                rc_g = lax.all_gather(rc, axis, axis=0, tiled=True)
                ec_g = bk._tpfa_vcycle(
                    rc_g, trans_levels, diag_levels, dim, 2, 40
                )
                ec = lax.dynamic_slice_in_dim(
                    ec_g, idx.astype(jnp.int32) * local0_c, local0_c, axis=0
                )
                shapes = [local_shape]
                for _ in range(local_levels - 1):
                    shapes.append(
                        tuple((n + 1) // 2 for n in shapes[-1])
                    )
                for fine_shape in reversed(shapes):
                    ec = bk._prolong_cells(ec, fine_shape, dim)
                return r / diag + ec

            return M

        def tpfa_operator(fw0_p, fw_rest):
            """(A, diag, M) for the shard-local weighted TPFA block."""
            trans0_p = jnp.where(
                pad_face, 0.0, face_vol[0] ** 2 / (fw0_p * cell_vol)
            )
            trans_rest = tuple(
                face_vol[k + 1] ** 2 / (fw_rest[k] * cell_vol)
                for k in range(dim - 1)
            )
            below = lax.ppermute(trans0_p[:1], axis, bwd)
            trans0_ext = jnp.concatenate([trans0_p, below], axis=0)
            t_up = jnp.where(pad_face, 0.0, trans0_ext[:-1])
            t_down = jnp.where(last_global, 0.0, trans0_ext[1:])
            # Interior axes ride the single-device stencil with the
            # sharded axis zeroed out.
            zeros0 = jnp.zeros((local0 - 1,) + rest, trans0_p.dtype)

            def A(p):
                local = bk.tpfa_apply(p, (zeros0, *trans_rest), dim)
                p_ext = halo_exchange(p, 1, axis, axis=0)
                return (
                    local
                    + t_up * (p - p_ext[:-2])
                    + t_down * (p - p_ext[2:])
                )

            diag = t_up + t_down
            for k in range(dim - 1):
                ax = k + 1
                diag = diag + _pad_axis(trans_rest[k], ax, 1, 0)
                diag = diag + _pad_axis(trans_rest[k], ax, 0, 1)
            diag = jnp.maximum(diag, 1e-30)
            M = (
                coarse_preconditioner(trans0_p, trans_rest, diag)
                if use_coarse
                else None
            )
            return A, diag, M

        def flux_from_pressure(fw0_p, fw_rest, p):
            prev_last = lax.ppermute(p[-1:], axis, fwd)
            p_above = jnp.concatenate([prev_last, p[:-1]], axis=0)
            grad0 = face_vol[0] * (p_above - p)
            u0_p = jnp.where(pad_face, 0.0, grad0 / (fw0_p * cell_vol))
            u_rest = []
            for k in range(dim - 1):
                ax = k + 1
                n = p.shape[ax]
                before = lax.slice_in_dim(p, 0, n - 1, axis=ax)
                after = lax.slice_in_dim(p, 1, n, axis=ax)
                grad = face_vol[ax] * (before - after)
                u_rest.append(grad / (fw_rest[k] * cell_vol))
            return u0_p, tuple(u_rest)

        sizes = [int(np.prod(local_shape))] + [
            int(np.prod(s)) for s in rest_faces_shapes
        ]
        offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(int)

        def flatten(u0_p, u_rest):
            return jnp.concatenate(
                [u0_p.reshape(-1)] + [u.reshape(-1) for u in u_rest]
            )

        def unflatten(flat):
            u0_p = flat[offsets[0]:offsets[1]].reshape(local_shape)
            u_rest = tuple(
                flat[offsets[k + 1]:offsets[k + 2]].reshape(
                    rest_faces_shapes[k]
                )
                for k in range(dim - 1)
            )
            return jnp.where(pad_face, 0.0, u0_p), u_rest

        def newton_step(state):
            u0_p, u_rest, _, dist_prev, k, _, aa_state = state
            rho = transport_density(u0_p, u_rest)
            fw0_p, fw_rest = face_weights(rho)
            A, diag, M = tpfa_operator(fw0_p, fw_rest)
            p = projected_pcg_local(
                A, diag, mass_rhs, axis, cg_tol, cg_maxiter, M=M
            )
            u0_new, u_rest_new = flux_from_pressure(fw0_p, fw_rest, p)

            if aa_depth > 0:
                xk = flatten(u0_p, u_rest)
                gk = flatten(u0_new, u_rest_new)
                aa_state, mixed = _anderson_mix_sharded(
                    aa_state, gk, gk - xk, axis
                )
                u0_new, u_rest_new = unflatten(mixed)

            rho_new = transport_density(u0_new, u_rest_new)
            distance = cell_vol * lax.psum(jnp.sum(rho_new), axis_name=axis)
            inc_sq = lax.psum(
                jnp.sum((u0_new - u0_p) ** 2)
                + sum(
                    jnp.sum((a - b) ** 2)
                    for a, b in zip(u_rest_new, u_rest)
                ),
                axis_name=axis,
            )
            norm_sq = lax.psum(
                jnp.sum(u0_new**2)
                + sum(jnp.sum(u**2) for u in u_rest_new),
                axis_name=axis,
            )
            rel_inc = jnp.sqrt(inc_sq / jnp.maximum(norm_sq, 1e-30))
            rel_dist = jnp.abs(distance - dist_prev) / jnp.maximum(
                distance, 1e-30
            )
            converged = jnp.logical_and(
                rel_inc < tol_increment, rel_dist < tol_distance
            )
            return u0_new, u_rest_new, p, distance, k + 1, converged, aa_state

        def cond(state):
            k, converged = state[4], state[5]
            return jnp.logical_and(k < num_iter, jnp.logical_not(converged))

        # Derive the carries from the (device-varying) input so the
        # while_loop's varying-manual-axes types match across iterations.
        def varying_zeros(target_shape):
            flat = jnp.zeros_like(
                mass_diff, shape=(int(np.prod(target_shape)),)
            )
            return flat.reshape(target_shape)

        flat_size = int(offsets[-1])
        aa_init = {
            "F": varying_zeros((max(aa_depth, 1), flat_size)),
            "G": varying_zeros((max(aa_depth, 1), flat_size)),
            "fkm1": varying_zeros((flat_size,)),
            "gkm1": varying_zeros((flat_size,)),
            "iteration": jnp.array(0, jnp.int32),
        }
        init = (
            jnp.zeros_like(mass_diff),
            tuple(varying_zeros(s) for s in rest_faces_shapes),
            jnp.zeros_like(mass_diff),
            jnp.array(jnp.inf, mass_diff.dtype),
            jnp.array(0, jnp.int32),
            jnp.array(False),
            aa_init,
        )
        u0_p, u_rest, p, distance, k, _, _ = lax.while_loop(
            cond, newton_step, init
        )
        return (distance, p, k, u0_p) + tuple(u_rest)

    rest_spec = (None,) * (dim - 1)
    flux_specs = tuple(P(axis, *rest_spec) for _ in range(dim))
    sharded = jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(axis, *rest_spec), P(axis, *rest_spec)),
            out_specs=(P(), P(axis, *rest_spec), P()) + flux_specs,
        )
    )

    if weight is None:
        weight_field = np.ones(shape, np.float32)
    else:
        weight_field = np.asarray(
            weight.img if hasattr(weight, "img") else weight, np.float32
        )
        assert weight_field.shape == shape

    def solve(mass_diff, return_fluxes: bool = False):
        out = sharded(
            jnp.asarray(mass_diff, jnp.float32), jnp.asarray(weight_field)
        )
        distance, p, k = out[0], out[1], out[2]
        if not return_fluxes:
            return distance, p, k
        # Per-axis face arrays in the single-device layout: the padded
        # axis-0 block drops the global-boundary pad slot.
        u0 = out[3][1:]
        fluxes = (u0,) + tuple(out[4:])
        return distance, fluxes, p, k

    return solve
