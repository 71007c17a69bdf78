"""Kernels for kernel-interpolation models — MXU-shaped.

Parity: reference ``src/darsia/utils/kernels.py:44-140``.  The reference
accelerates the support-sum with numba loops; here the linear combination
over supports is a single batched matmul / pairwise-distance contraction —
exactly the shape the TPU MXU wants, fused under jit.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp

__all__ = ["BaseKernel", "LinearKernel", "GaussianKernel"]


class BaseKernel(ABC):
    """Kernel interface: pointwise evaluation + weighted combination."""

    @abstractmethod
    def __call__(self, x, y):
        ...

    @abstractmethod
    def linear_combination(self, signal, supports, interpolation_weights):
        ...


class LinearKernel(BaseKernel):
    """Linear kernel k(x, y) = <x, y> + a."""

    def __init__(self, a: float = 0.0) -> None:
        self.a = a

    def __call__(self, x, y):
        return jnp.sum(jnp.multiply(jnp.asarray(x), jnp.asarray(y)), axis=-1) + self.a

    def linear_combination(self, signal, supports, interpolation_weights):
        """sum_n w_n (<signal, s_n> + a) = signal @ (S^T w) + a * sum w."""
        signal = jnp.asarray(signal, dtype=jnp.float32)
        supports = jnp.asarray(supports, dtype=jnp.float32)
        w = jnp.asarray(interpolation_weights, dtype=jnp.float32)
        # Collapse supports analytically: one dot against a single vector.
        combined = supports.T @ w  # (C,)
        return jnp.tensordot(signal, combined, axes=([-1], [0])) + self.a * jnp.sum(w)


class GaussianKernel(BaseKernel):
    """Gaussian RBF kernel k(x, y) = exp(-gamma ||x - y||^2)."""

    def __init__(self, gamma: float = 1.0) -> None:
        self.gamma = float(gamma)

    def __call__(self, x, y):
        diff = jnp.asarray(x) - jnp.asarray(y)
        return jnp.exp(-self.gamma * jnp.sum(diff * diff, axis=-1))

    def linear_combination(self, signal, supports, interpolation_weights):
        """Pairwise sq-distances via one matmul, then a weighted exp-sum."""
        signal = jnp.asarray(signal, dtype=jnp.float32)
        supports = jnp.asarray(supports, dtype=jnp.float32)
        w = jnp.asarray(interpolation_weights, dtype=jnp.float32)
        flat = signal.reshape(-1, signal.shape[-1])
        # ||x - s||^2 = ||x||^2 - 2 x.s + ||s||^2 — the x.s term is a matmul.
        x_sq = jnp.sum(flat * flat, axis=-1, keepdims=True)
        s_sq = jnp.sum(supports * supports, axis=-1)[None, :]
        cross = jnp.matmul(flat, supports.T, precision="highest")
        d2 = jnp.maximum(x_sq - 2.0 * cross + s_sq, 0.0)
        out = jnp.exp(-self.gamma * d2) @ w
        return out.reshape(signal.shape[:-1])
