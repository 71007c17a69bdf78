"""H1 regularization (mass + diffusion smoothing).

Parity: reference ``src/darsia/restoration/h1_regularization.py:15-117``.
Solves ``min_u 1/2||u - img||_{2,omega}^2 + 1/2||grad u||_{2,mu}^2`` via the
stencil solvers; multichannel images are batched with vmap instead of a
Python loop over channels.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dtype import convert_dtype
from ..utils.linear_solvers import Jacobi, Solver

__all__ = ["H1_regularization"]


def _regularize_array(img, mu, omega, dim, solver) -> jnp.ndarray:
    img = jnp.asarray(img)
    dtype = img.dtype
    work = jnp.asarray(convert_dtype(img, np.float32))
    solver.update_params(mass_coeff=omega, diffusion_coeff=mu, dim=dim)

    if work.ndim != dim:
        # Batch the trailing (range) axes with vmap.
        spatial = work.shape[:dim]
        flat = work.reshape(*spatial, -1)
        moved = jnp.moveaxis(flat, -1, 0)
        solved = jax.vmap(lambda c: solver(x0=c, rhs=omega * c))(moved)
        out = jnp.moveaxis(solved, 0, -1).reshape(work.shape)
    else:
        out = solver(x0=work, rhs=omega * work)
    return jnp.asarray(convert_dtype(out, dtype))


def H1_regularization(
    img,
    mu: float,
    omega: float = 1.0,
    dim: int = 2,
    solver: Union[Solver, None] = None,
):
    """H1-regularize an array or Image (same return type)."""
    solver = solver or Jacobi(maxiter=30)
    if hasattr(img, "img"):
        out = img.copy()
        out.img = _regularize_array(jnp.asarray(img.img), mu, omega, dim, solver)
        return out
    return _regularize_array(img, mu, omega, dim, solver)
