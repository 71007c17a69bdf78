"""Finite-difference stencils on images (pure JAX, fusable).

Parity: reference ``src/darsia/utils/derivatives.py:1-121``.  Conventions:
``backward_diff`` appends an edge copy (last entry 0), ``forward_diff``
prepends one (first entry 0); ``laplace`` is the symmetrized heterogeneous
div(D grad) with those boundary closures.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp

__all__ = ["backward_diff", "forward_diff", "laplace"]


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
    """Symmetrized heterogeneous Laplacian 0.5 (D- D D+ + D+ D D-)."""
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
