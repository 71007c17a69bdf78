"""Deformation correction — warp images by a registered deformation.

Parity: reference ``src/darsia/corrections/shape/deformation.py:15-62``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...image.image import Image
from ..base import BaseCorrection

__all__ = ["DeformationCorrection"]


class DeformationCorrection(BaseCorrection):
    """Correct images by registering them onto a baseline."""

    def __init__(self, base: Image, config: Optional[dict] = None) -> None:
        self.base = base
        config = config or {}
        from ...analysis.imageregistration import ImageRegistration

        self.image_registration = ImageRegistration(base, **config)

    def correct_array(self, img: jnp.ndarray) -> jnp.ndarray:
        probe = self.base.copy()
        probe.img = img
        registered = self.image_registration(probe)
        return jnp.asarray(registered.img)
