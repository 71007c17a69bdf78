"""Finite-difference stencils on images (pure JAX, fusable).

Parity: reference ``src/darsia/utils/derivatives.py:1-121``.  Conventions:
``backward_diff`` appends an edge copy (last entry 0), ``forward_diff``
prepends one (first entry 0); ``laplace`` is the symmetrized heterogeneous
div(D grad) with those boundary closures.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp

__all__ = ["backward_diff", "forward_diff", "laplace", "fv_laplace"]


def backward_diff(
    img: jnp.ndarray, axis: int, dim: int = 2, h: Optional[float] = None
) -> jnp.ndarray:
    """Difference ``img[i+1] - img[i]`` with zero closure at the top end."""
    assert axis < dim, "axis must be smaller than dimension"
    last = jnp.take(img, jnp.array([img.shape[axis] - 1]), axis=axis)
    out = jnp.diff(img, axis=axis, append=last)
    return out if h is None else out / h


def forward_diff(
    img: jnp.ndarray, axis: int, dim: int = 2, h: Optional[float] = None
) -> jnp.ndarray:
    """Difference ``img[i] - img[i-1]`` with zero closure at the bottom end."""
    assert axis < dim, "axis must be smaller than dimension"
    first = jnp.take(img, jnp.array([0]), axis=axis)
    out = jnp.diff(img, axis=axis, prepend=first)
    return out if h is None else out / h


def laplace(
    img: jnp.ndarray,
    axis: Optional[int] = None,
    dim: int = 2,
    h: Optional[float] = None,
    diffusion_coeff: Union[jnp.ndarray, float] = 1,
) -> jnp.ndarray:
    """Symmetrized heterogeneous Laplacian 0.5 (D- D D+ + D+ D D-).

    NOTE: exact parity port of reference ``utils/derivatives.py`` —
    including its boundary closures, which disagree with the reference's
    own production Jacobi smoother.  The solver stack uses
    :func:`fv_laplace` instead (see there); this function remains for API
    parity and for callers that need reference-``laplace`` semantics.
    """
    axes = range(dim) if axis is None else [axis]
    out = jnp.zeros_like(img)
    for ax in axes:
        out = out + 0.5 * (
            backward_diff(
                diffusion_coeff * forward_diff(img, ax, dim, h), ax, dim, h
            )
            + forward_diff(
                diffusion_coeff * backward_diff(img, ax, dim, h), ax, dim, h
            )
        )
    return out


def fv_laplace(
    img: jnp.ndarray,
    axis: Optional[int] = None,
    dim: int = 2,
    h: Optional[float] = None,
    diffusion_coeff: Union[jnp.ndarray, float] = 1,
) -> jnp.ndarray:
    """Finite-volume ``div(D grad)`` with zero-flux (Neumann) boundaries.

    For constant D this is the edge-replicated 5-point (2*dim+1) Laplacian
    — the operator the reference's production Jacobi smoother implements
    (ref ``utils/linear_solvers/jacobi.py:25-72``: ghost-copy neighbor
    accumulation, diag ``mass + 2*dim*D/h^2``) and the exact ``G^T G`` of
    the one-sided difference gradient used by split-Bregman shrinkage, so
    the TVD inner solve is variationally consistent with its splitting.
    Heterogeneous D is sampled on interior faces by arithmetic averaging;
    boundary faces carry zero flux.

    (The reference's ``laplace`` [derivatives.py] uses different boundary
    closures and disagrees with its own Jacobi; the solver stack here
    standardizes on this operator — verified against the reference Jacobi
    fixed point in ``tests/fidelity/test_fidelity_pipeline.py``.)
    """
    axes = range(dim) if axis is None else [axis]
    out = jnp.zeros_like(img)
    d_is_field = hasattr(diffusion_coeff, "ndim") and getattr(
        diffusion_coeff, "ndim", 0
    ) > 0
    if d_is_field:
        diffusion_coeff = jnp.broadcast_to(
            jnp.asarray(diffusion_coeff, dtype=img.dtype), img.shape
        )
    for ax in axes:
        grad = jnp.diff(img, axis=ax)  # interior faces along ax
        if d_is_field:
            n = img.shape[ax]
            lo = jnp.take(diffusion_coeff, jnp.arange(0, n - 1), axis=ax)
            hi = jnp.take(diffusion_coeff, jnp.arange(1, n), axis=ax)
            flux = 0.5 * (lo + hi) * grad
        else:
            flux = diffusion_coeff * grad
        zshape = list(flux.shape)
        zshape[ax] = 1
        zero = jnp.zeros(zshape, dtype=flux.dtype)
        padded = jnp.concatenate([zero, flux, zero], axis=ax)
        out = out + jnp.diff(padded, axis=ax)
    return out if h is None else out / (h * h)
