"""Anderson acceleration for fixed-point iterations.

Parity: reference ``src/darsia/utils/andersonacceleration.py:9-109``.
The inner least-squares mixing is a small dense solve — cheap on host or
device; kept numpy-based since iterates arrive per outer Newton/Bregman
step.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

__all__ = ["AndersonAcceleration"]


class AndersonAcceleration:
    """Anderson mixing of a fixed-point iteration.

    Args:
        dimension: flat dimension of the iterate (or tuple shape).
        depth: mixing depth (number of previous iterates).
        restart: optional restart period.

    """

    def __init__(
        self,
        dimension: Union[int, tuple],
        depth: int = 5,
        restart: Optional[int] = None,
    ) -> None:
        if isinstance(dimension, tuple):
            self._shape = dimension
            dimension = int(np.prod(dimension))
        else:
            self._shape = (dimension,)
        self.dimension = dimension
        self.depth = depth
        self.restart = restart
        self.reset()

    def reset(self) -> None:
        self._fkm1: Optional[np.ndarray] = None
        self._gkm1: Optional[np.ndarray] = None
        self._F = np.zeros((self.dimension, self.depth))
        self._G = np.zeros((self.dimension, self.depth))
        self._iteration = 0

    def __call__(self, gk: np.ndarray, fk: np.ndarray, iteration: Optional[int] = None):
        """Mix the next iterate.

        Args:
            gk: current fixed-point application g(x_k).
            fk: current residual f(x_k) = g(x_k) - x_k.
            iteration: explicit iteration counter (internal if omitted).

        Returns:
            accelerated iterate (same shape as input).

        """
        shape = np.asarray(gk).shape
        gk = np.asarray(gk).ravel()
        fk = np.asarray(fk).ravel()
        if iteration is None:
            iteration = self._iteration
        if self.restart is not None:
            iteration = iteration % self.restart

        if iteration == 0:
            self._F[:] = 0.0
            self._G[:] = 0.0
            xkp1 = gk
        else:
            mk = min(iteration, self.depth)
            col = (iteration - 1) % self.depth
            self._F[:, col] = fk - self._fkm1
            self._G[:, col] = gk - self._gkm1
            cols = [(iteration - 1 - j) % self.depth for j in range(mk)]
            F = self._F[:, cols]
            G = self._G[:, cols]
            gamma, *_ = np.linalg.lstsq(F, fk, rcond=None)
            xkp1 = gk - G @ gamma

        self._fkm1 = fk.copy()
        self._gkm1 = gk.copy()
        self._iteration += 1
        return xkp1.reshape(shape)
