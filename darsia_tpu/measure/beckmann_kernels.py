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
    density = jnp.zeros(shape, dtype=jnp.float32)
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
