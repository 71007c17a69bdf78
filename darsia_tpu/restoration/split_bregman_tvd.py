"""Split-Bregman total-variation denoising with heterogeneous weights.

Parity: reference ``src/darsia/restoration/split_bregman_tvd.py:14-177``.

TPU-native design: the whole Bregman iteration — inner diffusion solve
(Jacobi/CG/MG stencil solvers), shrinkage, convergence check — is ONE jitted
XLA program (`lax.while_loop`).  The reference's numba shrinkage kernel
("6 x faster" than numpy) becomes a trivially fused vector op; the inner
diffusion solve (reference: ~75% of CPU time) runs as fused stencil sweeps.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.solvers import (
    build_coefficient_pyramid,
    cg_solve,
    jacobi_solve,
    mg_solve,
)
from ..utils.derivatives import backward_diff, forward_diff
from ..utils.dtype import convert_dtype
from ..utils.linear_solvers import CG, MG, Jacobi, Solver

__all__ = ["split_bregman_tvd"]


class _TvdConfig(NamedTuple):
    """Static configuration keying one compiled fused TVD program."""

    shape: tuple
    dim: int
    max_num_iter: int
    isotropic: bool
    eps: Optional[float]
    solver_key: tuple


_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_MAX = 32


def _solver_signature(solver: Solver, dim: int, shape: tuple) -> tuple:
    """The solver attributes that shape the traced inner solve."""
    if isinstance(solver, MG):
        return ("mg", solver.depth, solver.smoother_iterations, solver.maxiter)
    if isinstance(solver, CG):
        return ("cg", solver.tol, solver.maxiter)
    return ("jacobi", max(solver.maxiter, 1))


def _fused_program(cfg: _TvdConfig, solver: Solver):
    """Jitted whole-loop TVD program, cached per static configuration."""
    prog = _PROGRAM_CACHE.get(cfg)
    if prog is not None:
        return prog

    dim = cfg.dim
    linear_solve = _make_linear_solve(solver, dim, cfg.shape)

    def run(work, mu_arr, omega_arr, ell_arr, x_init, d_init, b_init):
        img_nrm = jnp.maximum(jnp.linalg.norm(work), 1e-30)

        def rhs_function(d, b, ell_cur):
            result = omega_arr * work
            for i in range(dim):
                diff = ell_cur * (b[..., i] - d[..., i])
                result = result + forward_diff(diff, axis=i, dim=dim)
            return result

        def shrink_step(x_new, b, ell_cur):
            if cfg.isotropic:
                dub = jnp.stack(
                    [
                        backward_diff(x_new, j, dim) + b[..., j]
                        for j in range(dim)
                    ],
                    axis=-1,
                )
                s = jnp.linalg.norm(dub, axis=-1)
                shrinkage = jnp.maximum(s - mu_arr / ell_cur, 0.0) / (
                    s + 1e-18
                )
                d = dub * shrinkage[..., None]
                b = dub - d
            else:
                ds, bs = [], []
                for j in range(dim):
                    dub = backward_diff(x_new, j, dim) + b[..., j]
                    k = mu_arr / ell_cur
                    dj = jnp.maximum(jnp.abs(dub) - k, 0.0) * jnp.sign(dub)
                    ds.append(dj)
                    bs.append(dub - dj)
                d = jnp.stack(ds, axis=-1)
                b = jnp.stack(bs, axis=-1)
            return d, b

        def iteration(x, d, b):
            x_new = linear_solve(
                x, rhs_function(d, b, ell_arr), omega_arr, ell_arr
            )
            d, b = shrink_step(x_new, b, ell_arr)
            inc = jnp.linalg.norm(x_new - x) / img_nrm
            return x_new, d, b, inc

        if cfg.eps is None:

            def body(it, state):
                x, d, b = state
                x, d, b, _ = iteration(x, d, b)
                return (x, d, b)

            result, _, _ = lax.fori_loop(
                0, cfg.max_num_iter, body, (x_init, d_init, b_init)
            )
        else:

            def cond(state):
                _, _, _, inc, it = state
                return jnp.logical_and(
                    it < cfg.max_num_iter,
                    jnp.logical_or(it == 0, inc >= cfg.eps),
                )

            def body(state):
                x, d, b, _, it = state
                x, d, b, inc = iteration(x, d, b)
                return (x, d, b, inc, it + 1)

            result, *_ = lax.while_loop(
                cond, body, (x_init, d_init, b_init, jnp.float32(1.0), 0)
            )
        return result

    prog = jax.jit(run)
    if len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_MAX:
        _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
    _PROGRAM_CACHE[cfg] = prog
    return prog


def _make_linear_solve(solver: Solver, dim: int, shape):
    """Pure inner-solve closure matching the configured solver."""
    if isinstance(solver, MG):
        depth = min(
            solver.depth, max(int(np.log2(max(min(shape[:dim]), 2))) - 1, 0)
        )
        smoother_iterations = solver.smoother_iterations
        maxiter = solver.maxiter

        def solve(x0, rhs, mass, diff):
            mass_pyr = tuple(build_coefficient_pyramid(mass, shape, dim, depth + 1))
            diff_pyr = tuple(build_coefficient_pyramid(diff, shape, dim, depth + 1))
            return mg_solve(
                x0,
                rhs,
                mass_pyr,
                diff_pyr,
                dim=dim,
                depth=depth,
                smoother_iterations=smoother_iterations,
                maxiter=maxiter,
            )

        return solve
    if isinstance(solver, CG):
        tol = solver.tol if solver.tol is not None else 1e-8
        maxiter = solver.maxiter

        def solve(x0, rhs, mass, diff):
            return cg_solve(x0, rhs, mass, diff, dim=dim, tol=tol, maxiter=maxiter)

        return solve
    # Jacobi (default / fallback for any plain Solver).
    maxiter = max(solver.maxiter, 1)

    def solve(x0, rhs, mass, diff):
        return jacobi_solve(x0, rhs, mass, diff, dim=dim, maxiter=maxiter)

    return solve


def split_bregman_tvd(
    img,
    mu: Union[float, jnp.ndarray] = 1.0,
    omega: Union[float, jnp.ndarray] = 1.0,
    ell: Optional[Union[float, jnp.ndarray]] = None,
    dim: int = 2,
    max_num_iter: int = 100,
    eps: Optional[float] = None,
    x0: Optional[tuple] = None,
    isotropic: bool = False,
    verbose: Union[bool, int] = False,
    solver: Optional[Solver] = None,
    adaptive=None,
) -> jnp.ndarray:
    """Split-Bregman TV denoising.

    Args:
        img: image array (any image dtype; returned in the same dtype).
        mu: TV penalization (scalar or heterogeneous array).
        omega: mass penalization.
        ell: Bregman regularization weight; defaults to ``2 * mu``.
        dim: number of spatial axes.
        max_num_iter: outer Bregman iterations.
        eps: early-exit tolerance on the relative increment.
        x0: optional (image, d, b) initial state.
        isotropic: isotropic vs anisotropic shrinkage.
        solver: inner diffusion solver (Jacobi/CG/MG); Jacobi(20) default.
        adaptive: optional ``iter -> bool`` schedule triggering reweighting
            of ell from the current gradient.

    """
    img = jnp.asarray(img)
    img_dtype = img.dtype
    work = jnp.asarray(convert_dtype(img, np.float32))

    if ell is None:
        ell = 2 * mu
    if solver is None:
        solver = Jacobi(maxiter=20)
    solver.update_params(mass_coeff=omega, diffusion_coeff=ell, dim=dim)

    mu_arr = jnp.asarray(mu, dtype=jnp.float32)
    omega_arr = jnp.asarray(omega, dtype=jnp.float32)
    ell_arr = jnp.asarray(ell, dtype=jnp.float32)

    linear_solve = _make_linear_solve(solver, dim, work.shape)

    if x0 is not None:
        img0, d0, b0 = x0
        x_init = jnp.asarray(convert_dtype(jnp.asarray(img0), np.float32))
        d_init = jnp.asarray(d0, dtype=jnp.float32)
        b_init = jnp.asarray(b0, dtype=jnp.float32)
    else:
        x_init = work
        d_init = jnp.zeros((*work.shape, dim), dtype=jnp.float32)
        b_init = jnp.zeros((*work.shape, dim), dtype=jnp.float32)

    img_nrm = jnp.maximum(jnp.linalg.norm(work), 1e-30)
    adaptive_flags = tuple(
        bool(adaptive(i)) if adaptive is not None else False
        for i in range(max_num_iter)
    )
    any_adaptive = any(adaptive_flags)

    def rhs_function(d, b, ell_cur):
        result = omega_arr * work
        for i in range(dim):
            diff = ell_cur * (b[..., i] - d[..., i])
            result = result + forward_diff(diff, axis=i, dim=dim)
        return result

    def shrink_step(x_new, b, ell_cur):
        if isotropic:
            dub = jnp.stack(
                [
                    backward_diff(x_new, j, dim) + b[..., j]
                    for j in range(dim)
                ],
                axis=-1,
            )
            s = jnp.linalg.norm(dub, axis=-1)
            shrinkage = jnp.maximum(s - mu_arr / ell_cur, 0.0) / (s + 1e-18)
            d = dub * shrinkage[..., None]
            b = dub - d
        else:
            ds, bs = [], []
            for j in range(dim):
                dub = backward_diff(x_new, j, dim) + b[..., j]
                k = mu_arr / ell_cur
                dj = jnp.maximum(jnp.abs(dub) - k, 0.0) * jnp.sign(dub)
                ds.append(dj)
                bs.append(dub - dj)
            d = jnp.stack(ds, axis=-1)
            b = jnp.stack(bs, axis=-1)
        return d, b

    def iteration(x, d, b, ell_cur, it):
        x_new = linear_solve(x, rhs_function(d, b, ell_cur), omega_arr, ell_cur)
        d, b = shrink_step(x_new, b, ell_cur)
        inc = jnp.linalg.norm(x_new - x) / img_nrm
        return x_new, d, b, inc

    if any_adaptive:
        # Adaptive ell: per-iteration reweighting, loop unrolled on host
        # (schedule is static; each step is still one jitted program).
        x, d, b = x_init, d_init, b_init
        ell_cur = ell_arr
        for it in range(max_num_iter):
            x, d, b, inc = iteration(x, d, b, ell_cur, it)
            if adaptive_flags[it]:
                grad = jnp.stack(
                    [backward_diff(x, j, dim) for j in range(dim)], axis=-1
                )
                ell_cur = 1.0 / jnp.maximum(
                    jnp.sum(jnp.abs(grad), axis=-1), 1e-12
                )
            if eps is not None and float(inc) < eps:
                break
        result = x
    else:
        # The fused loop is compiled ONCE per static configuration and
        # cached: a fresh closure per call would re-trace (and on remote
        # backends re-compile, minutes) every invocation of the SAME
        # denoise — the production regime is one program reused over a
        # whole time series.
        solve = _fused_program(
            _TvdConfig(
                shape=tuple(work.shape),
                dim=dim,
                max_num_iter=int(max_num_iter),
                isotropic=bool(isotropic),
                eps=None if eps is None else float(eps),
                solver_key=_solver_signature(solver, dim, tuple(work.shape)),
            ),
            solver,
        )
        result = solve(
            work, mu_arr, omega_arr, ell_arr, x_init, d_init, b_init
        )

    return jnp.asarray(convert_dtype(result, img_dtype))
