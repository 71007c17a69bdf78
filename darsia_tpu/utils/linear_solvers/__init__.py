"""Matrix-free solver classes (API parity with the reference).

Parity: reference ``src/darsia/utils/linear_solvers/*.py`` — the abstract
problem ``mass_coeff * x - diffusion_coeff * laplace(x) = rhs``.  The
compute lives in :mod:`darsia_tpu.ops.solvers` (pure jitted functions);
these classes provide the stateful, config-friendly interface used by the
restoration pipeline.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from ...ops.solvers import (
    _operator,
    _prolong,
    _restrict,
    build_coefficient_pyramid,
    cg_solve,
    jacobi_solve,
    mg_solve,
)

__all__ = ["Solver", "Jacobi", "CG", "MG"]


class Solver:
    """Base class carrying the problem coefficients."""

    def __init__(
        self,
        maxiter: int = 1,
        tol: Optional[float] = None,
        dim: int = 2,
        mass_coeff=None,
        diffusion_coeff=None,
        verbose: bool = False,
    ) -> None:
        self.dim = dim
        self.maxiter = maxiter
        self.tol = tol
        self.mass_coeff = mass_coeff
        self.diffusion_coeff = diffusion_coeff
        self.verbose = verbose

    def update_params(
        self, dim: Optional[int] = None, mass_coeff=None, diffusion_coeff=None
    ) -> None:
        if dim is not None:
            self.dim = dim
        if mass_coeff is not None:
            self.mass_coeff = mass_coeff
        if diffusion_coeff is not None:
            self.diffusion_coeff = diffusion_coeff

    def _coeffs(self):
        mass = self.mass_coeff if self.mass_coeff is not None else 1.0
        diff = self.diffusion_coeff if self.diffusion_coeff is not None else 1.0
        if isinstance(mass, np.ndarray):
            mass = jnp.asarray(mass, dtype=jnp.float32)
        if isinstance(diff, np.ndarray):
            diff = jnp.asarray(diff, dtype=jnp.float32)
        return mass, diff

    def __call__(self, x0, rhs, h: float = 1.0):
        raise NotImplementedError


class Jacobi(Solver):
    """Jacobi sweeps — solver or smoother.

    Parity: ``utils/linear_solvers/jacobi.py:14``.
    """

    def __call__(self, x0, rhs, h: float = 1.0):
        mass, diff = self._coeffs()
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        rhs = jnp.asarray(rhs, dtype=jnp.float32)
        # tol-based early exit is not worth a while_loop for a smoother;
        # run the fixed sweep count (dominant use: MG smoothing, TVD inner).
        return jacobi_solve(
            x0, rhs, mass, diff, dim=self.dim, h=h, maxiter=self.maxiter
        )


class CG(Solver):
    """Conjugate gradients on the stencil operator (jitted while_loop).

    Parity: ``utils/linear_solvers/cg.py:10`` (scipy LinearOperator cg).
    """

    def __call__(self, x0, rhs, h: Optional[float] = None):
        mass, diff = self._coeffs()
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        rhs = jnp.asarray(rhs, dtype=jnp.float32)
        return cg_solve(
            x0,
            rhs,
            mass,
            diff,
            dim=self.dim,
            h=1.0 if h is None else h,
            tol=self.tol if self.tol is not None else 1e-8,
            maxiter=self.maxiter,
        )


class MG(Solver):
    """Geometric multigrid V-cycle solver.

    Parity: ``utils/linear_solvers/mg.py:13``; replaces pyamg/PETSc AMG on
    tensor-product grids.
    """

    def __init__(
        self,
        depth: int = 2,
        smoother_iterations: int = 5,
        maxiter: int = 100,
        tol: Optional[float] = None,
        dim: int = 2,
        mass_coeff=None,
        diffusion_coeff=None,
        verbose: bool = False,
    ) -> None:
        super().__init__(maxiter, tol, dim, mass_coeff, diffusion_coeff, verbose)
        self.depth = depth
        self.smoother_iterations = smoother_iterations

    def __call__(self, x0, rhs, h: float = 1.0):
        mass, diff = self._coeffs()
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        rhs = jnp.asarray(rhs, dtype=jnp.float32)
        # Clamp depth so the coarsest level stays non-degenerate.
        min_extent = min(x0.shape[: self.dim])
        depth = min(self.depth, max(int(np.log2(max(min_extent, 2))) - 1, 0))
        mass_pyr = tuple(
            build_coefficient_pyramid(mass, x0.shape, self.dim, depth + 1)
        )
        diff_pyr = tuple(
            build_coefficient_pyramid(diff, x0.shape, self.dim, depth + 1)
        )
        return mg_solve(
            x0,
            rhs,
            mass_pyr,
            diff_pyr,
            dim=self.dim,
            h=h,
            depth=depth,
            smoother_iterations=self.smoother_iterations,
            maxiter=self.maxiter,
            tol=self.tol,
        )

    # -- level-wise building blocks (reference mg.py:94-243 exposes these
    # as part of its public surface; here they delegate to the jitted
    # kernels in ops/solvers) --

    def operator(self, x, h: float = 1.0):
        """Apply ``mass*x - diffusion*laplace(x)`` at mesh size h
        (reference mg.py:94-108)."""
        mass, diff = self._coeffs()
        return _operator(
            jnp.asarray(x, dtype=jnp.float32), mass, diff, self.dim, h
        )

    def restriction(self, x):
        """Full-weighting restriction to the next-coarser grid
        (reference mg.py:110-132)."""
        return _restrict(jnp.asarray(x, dtype=jnp.float32), self.dim)

    def prolongation(self, x, target_shape=None):
        """Interpolate to the next-finer grid (reference mg.py:150-167)."""
        x = jnp.asarray(x, dtype=jnp.float32)
        if target_shape is None:
            target_shape = tuple(2 * s for s in x.shape[: self.dim]) + tuple(
                x.shape[self.dim :]
            )
        return _prolong(x, tuple(target_shape), self.dim)

    def restrict_parameters(self) -> None:
        """Coarsen the heterogeneous coefficients one level, pushing the
        fine versions on a stack (reference mg.py:134-148)."""
        if not hasattr(self, "_parameter_stack"):
            self._parameter_stack = []
        self._parameter_stack.append((self.mass_coeff, self.diffusion_coeff))
        mass, diff = self._coeffs()
        if hasattr(mass, "ndim") and mass.ndim >= self.dim:
            self.mass_coeff = _restrict(
                jnp.asarray(mass, dtype=jnp.float32), self.dim
            )
        if hasattr(diff, "ndim") and diff.ndim >= self.dim:
            self.diffusion_coeff = _restrict(
                jnp.asarray(diff, dtype=jnp.float32), self.dim
            )

    def prolongate_parameters(self, pad_tuple=None) -> None:
        """Undo the last :meth:`restrict_parameters`
        (reference mg.py:169-190)."""
        stack = getattr(self, "_parameter_stack", [])
        if not stack:
            raise RuntimeError("No restricted parameters to prolongate.")
        self.mass_coeff, self.diffusion_coeff = stack.pop()

    def base_V_Cycle(self, x0, rhs, h: float = 1.0):
        """One V-cycle (reference mg.py:192-243): the full solver with a
        single outer iteration."""
        mass, diff = self._coeffs()
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        rhs = jnp.asarray(rhs, dtype=jnp.float32)
        min_extent = min(x0.shape[: self.dim])
        depth = min(self.depth, max(int(np.log2(max(min_extent, 2))) - 1, 0))
        mass_pyr = tuple(
            build_coefficient_pyramid(mass, x0.shape, self.dim, depth + 1)
        )
        diff_pyr = tuple(
            build_coefficient_pyramid(diff, x0.shape, self.dim, depth + 1)
        )
        return mg_solve(
            x0,
            rhs,
            mass_pyr,
            diff_pyr,
            dim=self.dim,
            h=h,
            depth=depth,
            smoother_iterations=self.smoother_iterations,
            maxiter=1,
            tol=None,
        )
