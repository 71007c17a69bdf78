"""Piecewise perspective transform of patched images.

Parity: reference
``src/darsia/corrections/shape/piecewiseperspective.py:16-145``.

TPU-native deviation: the reference warps every patch with its own
cv2.warpPerspective and sums the canvases; here the per-patch corner
displacements are interpolated into one smooth coordinate field and applied
in a single warp pass — same result for overlapping smooth deformations,
one gather instead of N.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...image.image import Image
from ...ops.warp import identity_grid, warp_backend
from ...utils.interpolation import rbf_interpolate

__all__ = ["PiecewisePerspectiveTransform"]


class PiecewisePerspectiveTransform:
    """Warp an image by per-patch displacements."""

    def __init__(self, **kwargs) -> None:
        self.have_transform = False

    def find_and_warp(
        self,
        patches,
        displacement: np.ndarray,
        reverse: bool = False,
    ) -> Image:
        """Interpolate patch-center displacements and warp in one pass.

        Args:
            patches: Patches object of the image to warp.
            displacement: per-patch displacement, shape (N_i, N_j, 2) in
                (x, y) pixel convention (or flattened (N, 2)).
            reverse: flip the displacement direction.

        """
        base = patches.base
        shape = tuple(base.num_voxels[:2])
        centers = patches.centers_voxels.reshape(-1, 2)
        disp = np.asarray(displacement, dtype=float).reshape(-1, 2)
        if reverse:
            disp = -disp

        pts = np.stack([centers[:, 1], centers[:, 0]], axis=1)  # (x, y)
        H, W = shape
        rows, cols = np.meshgrid(
            np.arange(H, dtype=float), np.arange(W, dtype=float), indexing="ij"
        )
        query = np.stack([cols.ravel(), rows.ravel()], axis=1)
        if pts.shape[0] >= 3:
            dx = np.asarray(rbf_interpolate(pts, disp[:, 0], jnp.asarray(query)))
            dy = np.asarray(rbf_interpolate(pts, disp[:, 1], jnp.asarray(query)))
        else:
            dx = np.full(H * W, disp[:, 0].mean())
            dy = np.full(H * W, disp[:, 1].mean())
        field = jnp.stack(
            [
                jnp.asarray(dy.reshape(H, W), dtype=jnp.float32),
                jnp.asarray(dx.reshape(H, W), dtype=jnp.float32),
            ]
        )
        coords = identity_grid(shape) - field
        data = jnp.asarray(base.img).astype(jnp.float32)
        # dx/dy are concrete host arrays: the static Pallas bound is free.
        max_disp = int(np.ceil(max(np.abs(dx).max(), np.abs(dy).max()))) + 1
        out = warp_backend(data, coords, order=1, max_disp=max_disp)
        self.have_transform = True
        result = base.copy()
        result.img = out.astype(base.img.dtype)
        return result
