"""Earth mover's distance via cv2.EMD signatures.

Parity: reference ``src/darsia/measure/emd.py:15-263``.  The EMD itself is
cv2's C++ implementation (host-side; used for validation and small images —
the TPU path is the Beckmann solver family).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

__all__ = ["EMD"]


class EMD:
    """EMD between two images with identical total mass."""

    def __init__(self, preprocess: Optional[Callable] = None, **kwargs) -> None:
        self.preprocess = preprocess

    def __call__(self, img_1, img_2) -> float:
        import cv2

        if self.preprocess is not None:
            img_1 = self.preprocess(img_1)
            img_2 = self.preprocess(img_2)
        self._compatibility_check(img_1, img_2)

        # cv2.EMD returns work / total-weight: normalize the signatures to
        # unit mass and rescale by the total *physical* mass afterwards
        # (reference emd.py:60-82: dist * integral * cell_volume), so the
        # result is consistent with the Beckmann solvers for non-unit mass.
        cell_volume = float(np.prod(np.asarray(img_1.voxel_size)))
        integral = float(np.sum(np.asarray(img_1.img)))

        sig_1 = self._img_to_signature(img_1, normalization=integral)
        sig_2 = self._img_to_signature(img_2, normalization=integral)
        distance, _, _ = cv2.EMD(sig_1, sig_2, cv2.DIST_L2)
        return float(distance) * integral * cell_volume

    def distance_matrix(self, images: list) -> np.ndarray:
        """Symmetric N x N matrix of pairwise EMDs
        (reference emd.py:206-236)."""
        n = len(images)
        matrix = np.zeros((n, n), dtype=float)
        for i in range(n):
            for j in range(i + 1, n):
                matrix[i, j] = self(images[i], images[j])
                matrix[j, i] = matrix[i, j]
        return matrix

    def _compatibility_check(self, img_1, img_2) -> None:
        assert img_1.space_dim == 2 and img_2.space_dim == 2
        assert img_1.scalar and img_2.scalar
        assert tuple(img_1.num_voxels) == tuple(img_2.num_voxels)
        # Equal-mass check (weak, as in the reference).
        sum_1 = float(np.sum(np.asarray(img_1.img)))
        sum_2 = float(np.sum(np.asarray(img_2.img)))
        if not np.isclose(sum_1, sum_2, rtol=1e-3):
            raise ValueError("Images must have the same total mass.")

    @staticmethod
    def _img_to_signature(img, normalization: float = 1.0) -> np.ndarray:
        data = np.asarray(img.img, dtype=np.float32)
        if normalization not in (0.0, 1.0):
            data = data / np.float32(normalization)
        cs = img.coordinatesystem
        rows, cols = np.nonzero(data)
        values = data[rows, cols]
        coords = np.asarray(
            cs.coordinate(np.stack([rows, cols], axis=1))
        ).astype(np.float32)
        signature = np.concatenate(
            [values[:, None].astype(np.float32), coords], axis=1
        )
        return signature
