"""Color/white balances fit to swatch pairs.

Parity: reference ``src/darsia/corrections/color/colorbalance.py:10-298``.

TPU-first deviation: the reference minimizes the least-squares objectives
with Powell searches; all three balance families (diagonal, linear 3x3,
affine 3x3+shift) have exact **closed-form** least-squares solutions, used
here.  Application is a fused matmul (MXU-friendly: ``pixels @ B + t``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Literal

import jax.numpy as jnp
import numpy as np

__all__ = [
    "BaseBalance",
    "ColorBalance",
    "WhiteBalance",
    "AffineBalance",
    "AdaptiveBalance",
    "color_balance",
    "white_balance",
    "affine_balance",
]


class BaseBalance(ABC):
    """Base class for color balances: ``img @ balance_scaling (+ shift)``."""

    @abstractmethod
    def find_balance(self, swatches_src: np.ndarray, swatches_dst) -> None:
        ...

    def apply_balance(self, img):
        scaling = jnp.asarray(self.balance_scaling, dtype=jnp.float32)
        # 3-wide matmul: bandwidth-bound, so full fp32 accuracy is free.
        return jnp.matmul(jnp.asarray(img), scaling, precision="highest")

    def __call__(self, img, swatches_src, swatches_dst):
        self.find_balance(swatches_src, swatches_dst)
        return self.apply_balance(img)


class ColorBalance(BaseBalance):
    """Linear 3x3 balance, exact LS solve of ``min ||S B - D||_F``."""

    def __init__(self) -> None:
        self.balance_scaling: np.ndarray = np.eye(3)

    def find_balance(self, swatches_src: np.ndarray, swatches_dst) -> None:
        S = np.asarray(swatches_src, dtype=float).reshape(-1, 3)
        D = np.asarray(swatches_dst, dtype=float).reshape(-1, 3)
        self.balance_scaling, *_ = np.linalg.lstsq(S, D, rcond=None)


class WhiteBalance(BaseBalance):
    """Diagonal balance; per-channel closed-form LS."""

    def __init__(self) -> None:
        self.balance_scaling: np.ndarray = np.eye(3)

    def find_balance(self, swatches_src: np.ndarray, swatches_dst) -> None:
        S = np.asarray(swatches_src, dtype=float).reshape(-1, 3)
        D = np.asarray(swatches_dst, dtype=float).reshape(-1, 3)
        diag = np.array(
            [
                (S[:, i] @ D[:, i]) / (S[:, i] @ S[:, i])
                if (S[:, i] @ S[:, i]) > 0
                else 1.0
                for i in range(3)
            ]
        )
        self.balance_scaling = np.diag(diag)


class AffineBalance(BaseBalance):
    """Affine balance ``x @ B + t``; closed-form via augmented LS."""

    def __init__(self) -> None:
        self.balance_scaling: np.ndarray = np.eye(3)
        self.balance_translation: np.ndarray = np.zeros(3)

    def find_balance(self, swatches_src: np.ndarray, swatches_dst) -> None:
        S = np.asarray(swatches_src, dtype=float).reshape(-1, 3)
        D = np.asarray(swatches_dst, dtype=float).reshape(-1, 3)
        S_aug = np.hstack([S, np.ones((S.shape[0], 1))])
        sol, *_ = np.linalg.lstsq(S_aug, D, rcond=None)
        self.balance_scaling = sol[:3]
        self.balance_translation = sol[3]

    def apply_balance(self, img):
        scaling = jnp.asarray(self.balance_scaling, dtype=jnp.float32)
        shift = jnp.asarray(self.balance_translation, dtype=jnp.float32)
        return jnp.matmul(jnp.asarray(img), scaling, precision="highest") + shift


class AdaptiveBalance(AffineBalance):
    """Incrementally composed balance (diagonal/linear/affine updates)."""

    def __init__(self) -> None:
        super().__init__()

    def reset(self) -> None:
        self.balance_scaling = np.eye(3)
        self.balance_translation = np.zeros(3)

    def find_balance(
        self,
        swatches_src: np.ndarray,
        swatches_dst,
        mode: Literal["diagonal", "linear", "affine"] = "affine",
    ) -> None:
        # Precondition with the current balance; compose:
        # x B_prev B_new + (t_prev B_new + t_new)
        src_pre = np.asarray(
            self.apply_balance(np.asarray(swatches_src, dtype=float).reshape(-1, 3))
        )
        if mode == "diagonal":
            balance = WhiteBalance()
        elif mode == "linear":
            balance = ColorBalance()
        elif mode == "affine":
            balance = AffineBalance()
        else:
            raise ValueError(f"mode {mode} not supported.")
        balance.find_balance(src_pre, swatches_dst)
        # Application convention is x @ B, so composition is right-multiply.
        self.balance_scaling = self.balance_scaling @ balance.balance_scaling
        if mode == "affine":
            self.balance_translation = (
                self.balance_translation @ balance.balance_scaling
                + balance.balance_translation
            )
        else:
            self.balance_translation = (
                self.balance_translation @ balance.balance_scaling
            )


def color_balance(img, swatches_src, swatches_dst):
    """One-shot linear color balance."""
    return ColorBalance()(img, swatches_src, swatches_dst)


def white_balance(img, swatches_src, swatches_dst):
    """One-shot white balance."""
    return WhiteBalance()(img, swatches_src, swatches_dst)


def affine_balance(img, swatches_src, swatches_dst):
    """One-shot affine balance."""
    return AffineBalance()(img, swatches_src, swatches_dst)
