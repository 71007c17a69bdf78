"""Chambolle (2004) TV denoising as a jitted dual-projection loop.

Replaces ``skimage.restoration.denoise_tv_chambolle`` (reference call site
``src/darsia/restoration/tvd.py:78``) with a pure-JAX implementation of the
classic dual projection algorithm (A. Chambolle, "An algorithm for total
variation minimization and applications", JMIV 2004) — one XLA while_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["chambolle_tvd"]


def _divergence(p: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Divergence of the dual field p, shape (ndim, *spatial)."""
    d = -jnp.sum(p, axis=0)
    for ax in range(ndim):
        comp = p[ax]
        shifted = lax.slice_in_dim(comp, 0, comp.shape[ax] - 1, axis=ax)
        pad = [(0, 0)] * ndim
        pad[ax] = (1, 0)
        d = d + jnp.pad(shifted, pad)
    return d


def _gradient(out: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Forward-difference gradient with zero closure, shape (ndim, *spatial)."""
    comps = []
    for ax in range(ndim):
        diff = jnp.diff(out, axis=ax)
        pad = [(0, 0)] * ndim
        pad[ax] = (0, 1)
        comps.append(jnp.pad(diff, pad))
    return jnp.stack(comps, axis=0)


@functools.partial(jax.jit, static_argnames=("max_num_iter",))
def chambolle_tvd(
    image: jnp.ndarray,
    weight: float = 0.1,
    eps: float = 2e-4,
    max_num_iter: int = 200,
) -> jnp.ndarray:
    """TV denoising by Chambolle's dual projection.

    Args:
        image: float array (any rank; all axes treated as spatial).
        weight: denoising weight (larger = more denoising).
        eps: relative tolerance on the energy decrement.
        max_num_iter: iteration cap.

    """
    image = image.astype(jnp.float32)
    ndim = image.ndim
    tau = 1.0 / (2.0 * ndim)

    p0 = jnp.zeros((ndim, *image.shape), dtype=jnp.float32)

    def energy_and_step(p):
        d = _divergence(p, ndim)
        out = image + d
        g = _gradient(out, ndim)
        norm = jnp.sqrt(jnp.sum(g**2, axis=0))[None]
        E = jnp.sum(d**2) + weight * jnp.sum(norm)
        p_new = (p - tau * g) / (1.0 + (tau / weight) * norm)
        return p_new, out, E / image.size

    # First iteration establishes E_init.
    p, out, E_init = energy_and_step(p0)

    def cond(state):
        _, _, E_prev, E_curr, it = state
        return jnp.logical_and(
            it < max_num_iter,
            jnp.logical_or(it <= 1, jnp.abs(E_prev - E_curr) >= eps * E_init),
        )

    def body(state):
        p, _, _, E_curr, it = state
        p_new, out, E = energy_and_step(p)
        return (p_new, out, E_curr, E, it + 1)

    _, out, *_ = lax.while_loop(
        cond, body, (p, out, E_init + 1.0, E_init, 1)
    )
    return out
