"""Overlapping tile decomposition of images with blended reassembly.

Parity: reference ``src/darsia/image/patches.py:11-643`` (2d).

TPU note: Patches is the *host-facing* tiling API (ROI bookkeeping, blended
reassembly for visualization and patchwise pipelines).  The hot registration
path does not loop over Patch objects — it extracts all patch windows as one
batched array and vmaps the per-patch kernels (see
``analysis/translationanalysis.py``); the same tiling geometry also defines
the shard_map decomposition in :mod:`darsia_tpu.parallel`.
"""

from __future__ import annotations

from math import ceil
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..utils.point import make_coordinate
from .image import Image

__all__ = ["Patches"]


class Patches:
    """Array of overlapping patches of a 2d image."""

    def __init__(self, img: Image, num_patches, **kwargs) -> None:
        self.base = img
        if self.base.space_dim != 2:
            raise NotImplementedError("Only 2d patches supported.")
        if self.base.time_dim == 1:
            raise NotImplementedError("Space-time patches not supported.")

        if isinstance(num_patches, int):
            num_patches = [num_patches, num_patches]
        self.num_patches = list(num_patches)
        self.num_active_spatial_axes = min(len(self.num_patches), 2)
        self.relative_space_overlap = kwargs.get("rel_overlap", 0.0)

        nv = self.base.num_voxels
        # Patch sizes (voxels) without overlap; last patch absorbs remainder.
        pv = [ceil(nv[i] / self.num_patches[i]) for i in range(2)]
        ov = [ceil(self.relative_space_overlap * pv[i]) for i in range(2)]
        self.nv, self.pv, self.ov = nv, pv, ov

        # ROIs with and without overlap (matrix indexing of patches).
        self.rois = [
            [
                (
                    slice(max(i * pv[0] - ov[0], 0), min((i + 1) * pv[0] + ov[0], nv[0])),
                    slice(max(j * pv[1] - ov[1], 0), min((j + 1) * pv[1] + ov[1], nv[1])),
                )
                for j in range(self.num_patches[1])
            ]
            for i in range(self.num_patches[0])
        ]
        self.rois_without_overlap = [
            [
                (
                    slice(i * pv[0], min((i + 1) * pv[0], nv[0])),
                    slice(j * pv[1], min((j + 1) * pv[1], nv[1])),
                )
                for j in range(self.num_patches[1])
            ]
            for i in range(self.num_patches[0])
        ]

        # Patch images (lazily materialized).
        self._patch_images: dict[tuple[int, int], Image] = {}
        self._weights = None

    # --------------------------------------------------------------- access

    def __call__(self, i: int, j: int) -> Image:
        """Patch (i, j) as a physical sub-image."""
        if (i, j) not in self._patch_images:
            self._patch_images[(i, j)] = self.base.subregion(self.rois[i][j])
        return self._patch_images[(i, j)]

    def set_image(self, img: np.ndarray, i: int, j: int) -> None:
        """Replace the data of patch (i, j)."""
        patch = self.__call__(i, j)
        patch.img = img

    @property
    def centers_voxels(self) -> np.ndarray:
        """Voxel centers of all patches (num_i, num_j, 2), matrix indexing."""
        centers = np.zeros((*self.num_patches, 2))
        for i in range(self.num_patches[0]):
            for j in range(self.num_patches[1]):
                roi = self.rois_without_overlap[i][j]
                centers[i, j] = [
                    (roi[0].start + roi[0].stop) / 2,
                    (roi[1].start + roi[1].stop) / 2,
                ]
        return centers

    @property
    def centers_cartesian(self) -> np.ndarray:
        """Cartesian coordinates of patch centers."""
        voxels = self.centers_voxels.reshape(-1, 2)
        coords = np.asarray(self.base.coordinatesystem.coordinate(voxels))
        return coords.reshape((*self.num_patches, 2))

    def position(self, i: int, j: int) -> tuple[str, str]:
        """Position descriptors ("left"/"center"/"right" etc.)."""
        horizontal = (
            "top" if i == 0 else "bottom" if i == self.num_patches[0] - 1 else "center"
        )
        vertical = (
            "left" if j == 0 else "right" if j == self.num_patches[1] - 1 else "center"
        )
        return horizontal, vertical

    # ----------------------------------------------------------- reassembly

    def _prepare_weights(self) -> None:
        """Partition-of-unity ramp weights over the overlap zones."""
        if self._weights is not None:
            return
        self._weights = [
            [None] * self.num_patches[1] for _ in range(self.num_patches[0])
        ]
        for i in range(self.num_patches[0]):
            for j in range(self.num_patches[1]):
                roi = self.rois[i][j]
                h = roi[0].stop - roi[0].start
                w = roi[1].stop - roi[1].start
                wy = np.ones(h)
                wx = np.ones(w)
                # Ramps over doubled overlap regions (2*ov wide).
                ramp0 = 2 * self.ov[0]
                ramp1 = 2 * self.ov[1]
                if i > 0 and ramp0 > 0:
                    wy[:ramp0] = np.linspace(0, 1, ramp0, endpoint=False)
                if i < self.num_patches[0] - 1 and ramp0 > 0:
                    wy[-ramp0:] = np.linspace(1, 0, ramp0, endpoint=False)
                if j > 0 and ramp1 > 0:
                    wx[:ramp1] = np.linspace(0, 1, ramp1, endpoint=False)
                if j < self.num_patches[1] - 1 and ramp1 > 0:
                    wx[-ramp1:] = np.linspace(1, 0, ramp1, endpoint=False)
                self._weights[i][j] = np.outer(wy, wx)

    def assemble(self, update_img: bool = False) -> Image:
        """Reassemble patches (interior parts, no blending)."""
        shape = self.base.shape
        data = np.zeros(shape, dtype=np.float32)
        for i in range(self.num_patches[0]):
            for j in range(self.num_patches[1]):
                roi_clean = self.rois_without_overlap[i][j]
                roi = self.rois[i][j]
                patch_data = np.asarray(self.__call__(i, j).img)
                off0 = roi_clean[0].start - roi[0].start
                off1 = roi_clean[1].start - roi[1].start
                h = roi_clean[0].stop - roi_clean[0].start
                w = roi_clean[1].stop - roi_clean[1].start
                data[roi_clean] = patch_data[off0 : off0 + h, off1 : off1 + w]
        assembled = type(self.base)(img=data, **self.base.metadata())
        if update_img:
            self.base = assembled
        return assembled

    def blend_and_assemble(self, update_img: bool = False) -> Image:
        """Reassemble with partition-of-unity blending over overlaps."""
        self._prepare_weights()
        shape = self.base.shape
        data = np.zeros(shape, dtype=np.float32)
        weight_sum = np.zeros(shape[:2], dtype=np.float32)
        for i in range(self.num_patches[0]):
            for j in range(self.num_patches[1]):
                roi = self.rois[i][j]
                patch_data = np.asarray(self.__call__(i, j).img, dtype=np.float32)
                weight = self._weights[i][j]
                if patch_data.ndim == 3:
                    data[roi] += patch_data * weight[..., None]
                else:
                    data[roi] += patch_data * weight
                weight_sum[roi] += weight
        weight_sum = np.maximum(weight_sum, 1e-12)
        if data.ndim == 3:
            data /= weight_sum[..., None]
        else:
            data /= weight_sum
        assembled = type(self.base)(img=data, **self.base.metadata())
        if update_img:
            self.base = assembled
        return assembled
