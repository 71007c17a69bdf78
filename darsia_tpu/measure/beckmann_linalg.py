"""Pluggable linear solvers for the Beckmann pressure systems.

Parity: reference ``measure/beckmann_linalg.py:19-460`` (Direct, AMG,
CG, KSP, KSP-FieldSplit + factory).

TPU deviation: the reference wraps scipy ``splu``, pyamg
smoothed-aggregation AMG and PETSc KSP; here every solver runs on the
matrix-free TPFA stencil — dense solve for tiny systems, nullspace-
projected Jacobi-preconditioned CG, and a genuinely multilevel "AMG":
CG preconditioned by a Galerkin geometric-MG V-cycle
(:func:`darsia_tpu.measure.beckmann_kernels.tpfa_mg_pcg`), the structured-
grid equivalent of pyamg smoothed aggregation / Hypre BoomerAMG.
PETSc-style options dictionaries are accepted and mapped onto the
corresponding tolerances.
"""

from __future__ import annotations

from enum import Enum
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .beckmann_kernels import tpfa_apply, tpfa_cg, tpfa_mg_levels, tpfa_mg_pcg

__all__ = [
    "BeckmannLinearSolverType",
    "BeckmannLinearSolver",
    "BeckmannDirectSolver",
    "BeckmannAMGSolver",
    "BeckmannCGSolver",
    "BeckmannKSPSolver",
    "BeckmannKSPFieldSplitSolver",
    "BeckmannLinearSolverFactory",
]


class BeckmannLinearSolverType(str, Enum):
    DIRECT = "direct"
    AMG = "amg"
    CG = "cg"
    KSP = "ksp"
    KSP_FIELDSPLIT = "ksp-fieldsplit"


class BeckmannLinearSolver:
    """Solve the pure-Neumann TPFA system div(w grad p) = rhs.

    ``setup(trans)`` receives the per-dimension face transmissibilities;
    ``solve(rhs, x0)`` operates on grid-shaped arrays.
    """

    def __init__(self, shape: tuple, options: Optional[dict] = None) -> None:
        self.shape = tuple(int(s) for s in shape)
        self.dim = len(self.shape)
        self.options = options or {}
        self.tol = float(self.options.get("rtol", self.options.get("tol", 1e-6)))
        self.max_iter = int(
            self.options.get("maxiter", self.options.get("num_iter", 500))
        )
        self.trans: Optional[tuple] = None

    def setup(self, trans: tuple) -> None:
        self.trans = tuple(jnp.asarray(t) for t in trans)

    def solve(self, rhs, x0=None):
        raise NotImplementedError


class BeckmannCGSolver(BeckmannLinearSolver):
    """Nullspace-projected Jacobi-preconditioned CG (matrix-free)."""

    def solve(self, rhs, x0=None):
        assert self.trans is not None, "Call setup(trans) first."
        rhs = jnp.asarray(rhs).reshape(self.shape)
        x0 = (
            jnp.zeros(self.shape, rhs.dtype)
            if x0 is None
            else jnp.asarray(x0).reshape(self.shape)
        )
        return tpfa_cg(
            self.trans, rhs, x0, dim=self.dim, tol=self.tol, maxiter=self.max_iter
        )


class BeckmannDirectSolver(BeckmannLinearSolver):
    """Dense factorization with pinned nullspace (small grids only;
    reference: scipy splu)."""

    _MAX_CELLS = 4096

    def setup(self, trans: tuple) -> None:
        super().setup(trans)
        n = int(np.prod(self.shape))
        if n > self._MAX_CELLS:
            raise ValueError(
                f"Direct solver assembles a dense {n}x{n} operator; use CG "
                "for large grids."
            )
        eye = np.eye(n)
        columns = [
            np.asarray(
                tpfa_apply(
                    jnp.asarray(eye[:, i].reshape(self.shape)),
                    self.trans,
                    self.dim,
                )
            ).ravel()
            for i in range(n)
        ]
        A = np.stack(columns, axis=1).astype(np.float64)
        A += np.ones((n, n)) / n  # pin the constant mode
        self._A = A

    def solve(self, rhs, x0=None):
        rhs = np.asarray(rhs, dtype=np.float64).ravel()
        rhs = rhs - rhs.mean()
        x = np.linalg.solve(self._A, rhs)
        return jnp.asarray((x - x.mean()).reshape(self.shape))


class BeckmannAMGSolver(BeckmannLinearSolver):
    """Multilevel solver: CG preconditioned by a geometric-MG V-cycle.

    The reference builds pyamg smoothed aggregation on the assembled
    sparse operator (``beckmann_linalg.py:92-247``); on the structured
    TPFA grid the Galerkin aggregation hierarchy is available in closed
    form (:func:`darsia_tpu.measure.beckmann_kernels.tpfa_coarsen_trans`),
    giving roughly grid-independent iteration counts without assembly.
    """

    def __init__(self, shape, options: Optional[dict] = None) -> None:
        options = dict(options or {})
        options.setdefault("maxiter", 200)
        super().__init__(shape, options)
        self.levels = int(options.get("levels", tpfa_mg_levels(self.shape)))

    def solve(self, rhs, x0=None):
        assert self.trans is not None, "Call setup(trans) first."
        rhs = jnp.asarray(rhs).reshape(self.shape)
        x0 = (
            jnp.zeros(self.shape, rhs.dtype)
            if x0 is None
            else jnp.asarray(x0).reshape(self.shape)
        )
        return tpfa_mg_pcg(
            self.trans,
            rhs,
            x0,
            dim=self.dim,
            tol=self.tol,
            maxiter=self.max_iter,
            levels=self.levels,
        )


class BeckmannKSPSolver(BeckmannAMGSolver):
    """PETSc-KSP facade: accepts petsc-style options, runs MG-preconditioned
    projected CG (the reference KSP default is Hypre-AMG-preconditioned CG,
    ``beckmann_linalg.py:249-347``)."""

    def __init__(self, shape, options: Optional[dict] = None) -> None:
        options = dict(options or {})
        petsc = options.pop("petsc_options", {})
        options.setdefault("rtol", petsc.get("ksp_rtol", 1e-6))
        options.setdefault("maxiter", petsc.get("ksp_max_it", 500))
        super().__init__(shape, options)


class BeckmannKSPFieldSplitSolver(BeckmannKSPSolver):
    """Fieldsplit facade: the flux block is diagonal in the TPFA setting,
    so the Schur complement IS the projected pressure system solved here."""


class BeckmannLinearSolverFactory:
    """Instantiate solvers by type string (reference :411-460)."""

    _REGISTRY = {
        BeckmannLinearSolverType.DIRECT: BeckmannDirectSolver,
        BeckmannLinearSolverType.AMG: BeckmannAMGSolver,
        BeckmannLinearSolverType.CG: BeckmannCGSolver,
        BeckmannLinearSolverType.KSP: BeckmannKSPSolver,
        BeckmannLinearSolverType.KSP_FIELDSPLIT: BeckmannKSPFieldSplitSolver,
    }

    @classmethod
    def create(
        cls, solver_type, shape, options: Optional[dict] = None
    ) -> BeckmannLinearSolver:
        solver_type = BeckmannLinearSolverType(str(solver_type).lower())
        return cls._REGISTRY[solver_type](shape, options)
