"""Jitted stencil kernels for the Beckmann problem.

TPU-native core replacing the reference's sparse-matrix assembly + PETSc /
pyamg / SuperLU backends (``src/darsia/measure/beckmann_problem.py:276-359``,
``beckmann_linalg.py:55-410``): fluxes live as per-axis face arrays, the
divergence/gradient are stencil ops, and the pressure Schur complement is a
TPFA operator solved with a Jacobi-preconditioned, nullspace-projected CG —
one fused XLA program per solve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "face_divergence",
    "pressure_gradient_faces",
    "face_to_cell_pt",
    "transport_density_cells",
    "tpfa_apply",
    "tpfa_cg",
    "tpfa_mg_pcg",
    "tpfa_coarsen_trans",
    "tpfa_mg_levels",
    "harmonic_face_average",
]


def _pad_axis(arr, axis, before, after):
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (before, after)
    return jnp.pad(arr, pads)


def face_divergence(fluxes: tuple, face_vol: tuple, dim: int) -> jnp.ndarray:
    """Integrated cell divergence of per-axis face fluxes.

    Sign convention matches the reference FVDivergence: the cell before a
    face (lower index) receives +face_vol*u, the cell after receives -.
    """
    div = None
    for d in range(dim):
        u = fluxes[d]
        contrib = face_vol[d] * (
            _pad_axis(u, d, 0, 1) - _pad_axis(u, d, 1, 0)
        )
        div = contrib if div is None else div + contrib
    return div


def pressure_gradient_faces(p: jnp.ndarray, face_vol: tuple, dim: int) -> tuple:
    """(D^T p) per axis: face value = face_vol * (p_before - p_after)."""
    out = []
    for d in range(dim):
        n = p.shape[d]
        before = lax.slice_in_dim(p, 0, n - 1, axis=d)
        after = lax.slice_in_dim(p, 1, n, axis=d)
        out.append(face_vol[d] * (before - after))
    return tuple(out)


def face_to_cell_pt(fluxes: tuple, pt: jnp.ndarray, shape: tuple, dim: int):
    """RT0 evaluation of the flux at relative point ``pt`` in each cell."""
    comps = []
    for d in range(dim):
        u = fluxes[d]
        comp = pt[d] * _pad_axis(u, d, 0, 1) + (1 - pt[d]) * _pad_axis(u, d, 1, 0)
        comps.append(comp)
    return jnp.stack(comps, axis=-1)


def transport_density_cells(
    fluxes: tuple,
    quad_pts: jnp.ndarray,
    quad_weights: jnp.ndarray,
    cell_weights,
    shape: tuple,
    dim: int,
) -> jnp.ndarray:
    """Quadrature of |weight * RT0 flux| over each cell."""
    density = jnp.zeros(shape, dtype=fluxes[0].dtype)
    for q in range(quad_pts.shape[0]):
        cell_flux = face_to_cell_pt(fluxes, quad_pts[q], shape, dim)
        if not (np.isscalar(cell_weights) and cell_weights == 1):
            cell_flux = cell_flux * jnp.asarray(cell_weights)[..., None]
        density = density + quad_weights[q] * jnp.linalg.norm(cell_flux, axis=-1)
    return density


def harmonic_face_average(cell_qty: jnp.ndarray, dim: int) -> tuple:
    """Regularized harmonic mean of a cell quantity on interior faces."""
    out = []
    for d in range(dim):
        n = cell_qty.shape[d]
        a = lax.slice_in_dim(cell_qty, 0, n - 1, axis=d)
        b = lax.slice_in_dim(cell_qty, 1, n, axis=d)
        denom = a + b
        out.append(
            jnp.where(denom > 0, 2.0 * a * b / jnp.where(denom == 0, 1.0, denom), 0.0)
        )
    return tuple(out)


def tpfa_apply(p: jnp.ndarray, trans: tuple, dim: int) -> jnp.ndarray:
    """Apply the TPFA operator A p = D diag(1/w m) D^T p.

    ``trans[d]`` are per-face transmissibilities (face arrays).
    """
    out = jnp.zeros_like(p)
    for d in range(dim):
        n = p.shape[d]
        before = lax.slice_in_dim(p, 0, n - 1, axis=d)
        after = lax.slice_in_dim(p, 1, n, axis=d)
        face_flux = trans[d] * (before - after)
        out = out + _pad_axis(face_flux, d, 0, 1) - _pad_axis(face_flux, d, 1, 0)
    return out


@functools.partial(jax.jit, static_argnames=("dim", "maxiter"))
def tpfa_cg(
    trans: tuple,
    rhs: jnp.ndarray,
    x0: jnp.ndarray,
    dim: int = 2,
    tol: float = 1e-6,
    maxiter: int = 500,
) -> jnp.ndarray:
    """Nullspace-projected, Jacobi-preconditioned CG for the TPFA system.

    The pure-Neumann TPFA operator has the constants as nullspace; rhs and
    iterates are orthogonalized against constants (equivalent to the
    reference's Lagrange-multiplier pressure constraint, but SPD-friendly).
    """
    n_cells = rhs.size

    def project(v):
        return v - jnp.mean(v)

    # Diagonal of A for Jacobi preconditioning.
    diag = jnp.zeros_like(rhs)
    for d in range(dim):
        t = trans[d]
        diag = diag + _pad_axis(t, d, 0, 1) + _pad_axis(t, d, 1, 0)
    diag = jnp.maximum(diag, 1e-30)

    def A(p):
        return tpfa_apply(p, trans, dim)

    b = project(rhs)
    x = project(x0)
    r = b - A(x)
    z = project(r / diag)
    pvec = z
    rz = jnp.vdot(r, z)
    b_norm = jnp.maximum(jnp.linalg.norm(b), 1e-30)

    def cond(state):
        _, r, _, rz, k = state
        # Stop on convergence, iteration cap, or float32 breakdown (rz
        # hitting denormals / non-finite values near machine precision).
        healthy = jnp.logical_and(jnp.isfinite(rz), rz > 1e-28)
        return jnp.logical_and(
            jnp.logical_and(k < maxiter, jnp.linalg.norm(r) > tol * b_norm),
            healthy,
        )

    def body(state):
        x, r, pvec, rz, k = state
        Ap = A(pvec)
        alpha = rz / jnp.maximum(jnp.vdot(pvec, Ap), 1e-30)
        x_new = project(x + alpha * pvec)
        r_new = r - alpha * Ap
        z = project(r_new / diag)
        rz_new = jnp.vdot(r_new, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        pvec_new = z + beta * pvec
        # Reject non-finite updates (keep last healthy iterate).
        ok = jnp.isfinite(jnp.vdot(x_new, x_new))
        x_new = jnp.where(ok, x_new, x)
        r_new = jnp.where(ok, r_new, r)
        return (x_new, r_new, pvec_new, rz_new, k + 1)

    x, *_ = lax.while_loop(cond, body, (x, r, pvec, rz, 0))
    return x


# --------------------------------------------------------------------------
# Geometric multigrid preconditioner for the TPFA system.
#
# Replaces the role of the reference's pyamg smoothed-aggregation AMG and
# PETSc/Hypre KSP (``beckmann_linalg.py:92-247,249-410``) on the structured
# tensor-product grids: cells aggregate in 2^dim blocks, the coarse operator
# is the exact Galerkin product P^T A P (for piecewise-constant prolongation
# P the TPFA operator coarsens to a TPFA operator whose coarse face
# transmissibility is the sum of the fine faces crossing the aggregate
# boundary — interior faces drop out), and the smoother is damped Jacobi,
# which is self-adjoint in the A-inner product, so the V-cycle is an SPD
# preconditioner safe for CG.
# --------------------------------------------------------------------------


def _pair_sum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Sum adjacent pairs along ``axis`` (odd tail aggregates alone)."""
    if x.shape[axis] % 2:
        x = _pad_axis(x, axis, 0, 1)
    n = x.shape[axis]
    even = lax.slice_in_dim(x, 0, n, stride=2, axis=axis)
    odd = lax.slice_in_dim(x, 1, n, stride=2, axis=axis)
    return even + odd


def tpfa_coarsen_trans(trans: tuple, dim: int) -> tuple:
    """Galerkin (P^T A P) coarse transmissibilities for 2x aggregation.

    The coarse face between aggregates I and I+1 along axis ``d`` collects
    the fine faces at odd index 2I+1 along ``d``, summed over the (up to)
    2^(dim-1) transverse fine positions inside the aggregate.
    """
    out = []
    for d in range(dim):
        t = trans[d]
        t = lax.slice_in_dim(t, 1, t.shape[d], stride=2, axis=d)
        for e in range(dim):
            if e != d:
                t = _pair_sum(t, e)
        out.append(t)
    return tuple(out)


def _tpfa_diag(trans: tuple, dim: int) -> jnp.ndarray:
    diag = None
    for d in range(dim):
        contrib = _pad_axis(trans[d], d, 0, 1) + _pad_axis(trans[d], d, 1, 0)
        diag = contrib if diag is None else diag + contrib
    return jnp.maximum(diag, 1e-30)


def _restrict_cells(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Aggregate-sum restriction R = P^T (piecewise-constant P)."""
    for d in range(dim):
        x = _pair_sum(x, d)
    return x


def _prolong_cells(x: jnp.ndarray, fine_shape: tuple, dim: int) -> jnp.ndarray:
    """Piecewise-constant prolongation (inject into each aggregate cell)."""
    for d in range(dim):
        x = jnp.repeat(x, 2, axis=d)
        x = lax.slice_in_dim(x, 0, fine_shape[d], axis=d)
    return x


def _tpfa_sweeps(x, b, trans, diag, dim, nu, omega=0.8):
    def body(_, xx):
        return xx + omega * (b - tpfa_apply(xx, trans, dim)) / diag

    return lax.fori_loop(0, nu, body, x)


def _tpfa_vcycle(b, trans_levels, diag_levels, dim, nu, nu_coarse, level=0):
    trans = trans_levels[level]
    diag = diag_levels[level]
    x = _tpfa_sweeps(jnp.zeros_like(b), b, trans, diag, dim, nu)
    if level == len(trans_levels) - 1:
        return _tpfa_sweeps(x, b, trans, diag, dim, nu_coarse)
    r = b - tpfa_apply(x, trans, dim)
    rc = _restrict_cells(r, dim)
    ec = _tpfa_vcycle(rc, trans_levels, diag_levels, dim, nu, nu_coarse, level + 1)
    x = x + _prolong_cells(ec, b.shape, dim)
    return _tpfa_sweeps(x, b, trans, diag, dim, nu)


def tpfa_mg_levels(shape: tuple, max_levels: int = 6, coarsest: int = 4) -> int:
    """Static level count: halve until the smallest axis reaches ``coarsest``."""
    levels = 1
    sizes = [int(s) for s in shape]
    while levels < max_levels and min(sizes) >= 2 * coarsest:
        sizes = [(s + 1) // 2 for s in sizes]
        levels += 1
    return levels


@functools.partial(
    jax.jit, static_argnames=("dim", "maxiter", "levels", "nu", "nu_coarse")
)
def tpfa_mg_pcg(
    trans: tuple,
    rhs: jnp.ndarray,
    x0: jnp.ndarray,
    dim: int = 2,
    tol: float = 1e-6,
    maxiter: int = 200,
    levels: int = 4,
    nu: int = 2,
    nu_coarse: int = 40,
) -> jnp.ndarray:
    """Nullspace-projected CG preconditioned by one geometric-MG V-cycle.

    On heterogeneous 1/|u| mobility weights the Jacobi-preconditioned
    :func:`tpfa_cg` iteration count grows with grid size and weight
    contrast; the Galerkin V-cycle keeps it roughly grid-independent
    (reference role: pyamg smoothed aggregation, ``beckmann_linalg.py:92``).
    """
    trans_levels = [tuple(jnp.asarray(t) for t in trans)]
    for _ in range(levels - 1):
        trans_levels.append(tpfa_coarsen_trans(trans_levels[-1], dim))
    diag_levels = [_tpfa_diag(t, dim) for t in trans_levels]

    def project(v):
        return v - jnp.mean(v)

    def A(p):
        return tpfa_apply(p, trans_levels[0], dim)

    def M(r):
        return project(
            _tpfa_vcycle(r, trans_levels, diag_levels, dim, nu, nu_coarse)
        )

    b = project(rhs)
    x = project(x0)
    r = b - A(x)
    z = M(r)
    pvec = z
    rz = jnp.vdot(r, z)
    b_norm = jnp.maximum(jnp.linalg.norm(b), 1e-30)

    def cond(state):
        _, r, _, rz, k = state
        healthy = jnp.logical_and(jnp.isfinite(rz), jnp.abs(rz) > 1e-28)
        return jnp.logical_and(
            jnp.logical_and(k < maxiter, jnp.linalg.norm(r) > tol * b_norm),
            healthy,
        )

    def body(state):
        x, r, pvec, rz, k = state
        Ap = A(pvec)
        alpha = rz / jnp.maximum(jnp.vdot(pvec, Ap), 1e-30)
        x_new = project(x + alpha * pvec)
        r_new = r - alpha * Ap
        z = M(r_new)
        rz_new = jnp.vdot(r_new, z)
        beta = rz_new / rz
        pvec_new = z + beta * pvec
        ok = jnp.isfinite(jnp.vdot(x_new, x_new))
        x_new = jnp.where(ok, x_new, x)
        r_new = jnp.where(ok, r_new, r)
        return (x_new, r_new, pvec_new, rz_new, k + 1)

    x, *_ = lax.while_loop(cond, body, (x, r, pvec, rz, 0))
    return x
