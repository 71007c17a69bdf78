"""Rotation correction around an anchor voxel (2d/3d).

Parity: reference ``src/darsia/corrections/shape/rotation.py:17-213``.
The voxel resampling runs through the shared warp kernel (single gather).
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from ...image.indexing import interpret_indexing
from ...ops.warp import affine_grid, warp
from ..base import BaseCorrection
from .affine import AffineTransformation, _rotvec_matrix

__all__ = ["RotationCorrection"]


class RotationCorrection(BaseCorrection):
    """Rotate image data around an anchor voxel.

    Args:
        anchor: rotation anchor (voxel, matrix indexing).
        kwargs: either ``rotations`` (2d: [angle]; 3d: list of
            (angle, cartesian_axis) pairs) or ``rotation_from_isometry=True``
            with ``pts_src``/``pts_dst`` point pairs.

    """

    def __init__(self, anchor: Union[list, np.ndarray], **kwargs) -> None:
        self.anchor = np.asarray(anchor, dtype=float)
        dim = len(self.anchor)
        self.dim = dim

        if kwargs.get("rotation_from_isometry", False):
            pts_src = np.asarray(kwargs["pts_src"], dtype=float)
            pts_dst = np.asarray(kwargs["pts_dst"], dtype=float)
            affine_map = AffineTransformation(dim)
            affine_map.fit(pts_src, pts_dst, {"isometry": True})
            self.rotation = affine_map.rotation
            self.rotation_inv = np.linalg.inv(affine_map.rotation)
        else:
            rotations = kwargs.get("rotations")
            if rotations is None:
                raise ValueError("No means provided to determine rotations.")
            if dim == 2:
                degree = rotations[0]
                self.rotation = _rotvec_matrix(
                    degree * np.array([0.0, 0.0, 1.0])
                )[:2, :2]
                self.rotation_inv = _rotvec_matrix(
                    -degree * np.array([0.0, 0.0, 1.0])
                )[:2, :2]
            elif dim == 3:
                self.rotation = np.eye(3)
                self.rotation_inv = np.eye(3)
                for degree, cartesian_axis in rotations:
                    matrix_axis, reverted = interpret_indexing(
                        cartesian_axis, "xyz"[:dim]
                    )
                    vector = np.eye(3)[matrix_axis]
                    flip = -1.0 if reverted else 1.0
                    self.rotation = self.rotation @ _rotvec_matrix(
                        flip * degree * vector
                    )
                    self.rotation_inv = self.rotation_inv @ _rotvec_matrix(
                        -degree * vector
                    )

    def correct_array(self, img: jnp.ndarray) -> jnp.ndarray:
        img = jnp.asarray(img)
        spatial = tuple(img.shape[: self.dim])
        # Pull-back: p_src = anchor + R^-1 (p_dst - anchor).
        matrix = jnp.asarray(self.rotation_inv, dtype=jnp.float32)
        translation = jnp.asarray(
            self.anchor - self.rotation_inv @ self.anchor, dtype=jnp.float32
        )
        coords = affine_grid(matrix, translation, spatial)
        dtype = img.dtype
        out = warp(img.astype(jnp.float32), coords, order=0)
        if jnp.issubdtype(dtype, jnp.integer):
            out = jnp.round(out)
        return out.astype(dtype)

    def save(self, path) -> None:
        from pathlib import Path

        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            class_name=type(self).__name__,
            anchor=self.anchor,
            rotation=self.rotation,
            rotation_inv=self.rotation_inv,
        )

    def load(self, path) -> None:
        data = np.load(path, allow_pickle=True)
        self.anchor = data["anchor"]
        self.dim = len(self.anchor)
        self.rotation = data["rotation"]
        self.rotation_inv = data["rotation_inv"]
