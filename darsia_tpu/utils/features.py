"""Feature-based image matching (ORB-free).

Parity target: reference ``src/darsia/utils/features.py:12-167`` (cv2 ORB +
brute-force matching).  TPU-native replacement: deterministic FFT
phase-correlation matching of (sub-)windows — the downstream consumers
(translation estimation, drift correction) only ever use the *aggregate
translation* of the matches, which phase correlation estimates directly and
robustly (SURVEY §2.11).  A sparse keypoint interface is kept for API
compatibility: strong Harris corners serve as feature locations.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.fft import phase_correlation

__all__ = ["FeatureDetection", "harris_corners"]


def harris_corners(
    gray: np.ndarray, max_features: int = 200, k: float = 0.05
) -> np.ndarray:
    """Harris corner keypoints (row, col), strongest first (jitted score)."""
    g = jnp.asarray(gray, dtype=jnp.float32)
    from jax.scipy.signal import convolve2d

    kx = jnp.array([[-1, 0, 1]], dtype=jnp.float32)
    gx = convolve2d(g, kx, mode="same")
    gy = convolve2d(g, kx.T, mode="same")
    win = jnp.ones((5, 5), dtype=jnp.float32) / 25.0
    sxx = convolve2d(gx * gx, win, mode="same")
    syy = convolve2d(gy * gy, win, mode="same")
    sxy = convolve2d(gx * gy, win, mode="same")
    det = sxx * syy - sxy * sxy
    trace = sxx + syy
    response = np.asarray(det - k * trace**2)
    # Non-maximum suppression on a coarse grid.
    from scipy import ndimage

    maxima = response == ndimage.maximum_filter(response, size=9)
    response = np.where(maxima, response, -np.inf)
    flat = np.argsort(response.ravel())[::-1][:max_features]
    rows, cols = np.unravel_index(flat, response.shape)
    keep = response[rows, cols] > 0
    return np.stack([rows[keep], cols[keep]], axis=1)


class FeatureDetection:
    """Feature detection + matching facade.

    ``find_matches`` returns matched point pairs consistent with the
    dominant rigid translation between the images (estimated by phase
    correlation): keypoints of the source plus their translated partners.
    """

    def __init__(self, max_features: int = 200, tol: float = 0.05) -> None:
        self.max_features = max_features
        self.tol = tol

    def detect(self, img: np.ndarray) -> np.ndarray:
        gray = self._gray(img)
        return harris_corners(gray, self.max_features)

    @staticmethod
    def _gray(img) -> np.ndarray:
        arr = np.asarray(img.img if hasattr(img, "img") else img)
        if arr.ndim == 3:
            from ..ops.color import rgb_to_gray

            return np.asarray(rgb_to_gray(jnp.asarray(arr, dtype=jnp.float32)))
        return arr.astype(np.float32)

    @classmethod
    def extract_features(
        cls,
        img,
        roi: Optional[tuple] = None,
        mask: Optional[np.ndarray] = None,
        max_features: int = 200,
    ) -> tuple:
        """Extract (keypoints, patch descriptors) from an image region
        (reference features.py:21-88, ORB → Harris + window signature).

        Returns a tuple ``(keypoints (N, 2) row/col, descriptors (N, D))``.
        """
        gray = cls._gray(img)
        if roi is not None:
            gray = gray[roi]
        if mask is not None:
            gray = np.where(
                np.asarray(mask, dtype=bool)[: gray.shape[0], : gray.shape[1]],
                gray,
                0.0,
            )
        keypoints = harris_corners(gray, max_features)
        # Descriptor: normalized 8x8 intensity patch around each corner.
        half = 4
        padded = np.pad(gray, half, mode="edge")
        descriptors = np.stack(
            [
                padded[r : r + 2 * half, c : c + 2 * half].ravel()
                for r, c in keypoints
            ]
        ) if len(keypoints) else np.zeros((0, 64), dtype=np.float32)
        if len(descriptors):
            descriptors = descriptors - descriptors.mean(axis=1, keepdims=True)
            norms = np.linalg.norm(descriptors, axis=1, keepdims=True)
            descriptors = descriptors / np.maximum(norms, 1e-12)
        return keypoints.astype(float), descriptors.astype(np.float32)

    @classmethod
    def match_features(
        cls,
        features_src: tuple,
        features_dst: tuple,
        keep_percent: float = 0.1,
        return_matches: bool = False,
    ) -> tuple:
        """Match feature sets by descriptor correlation
        (reference features.py:90-160, BFMatcher → dense argmax matching).

        Returns ``(pts_src, pts_dst)`` of the kept matches, plus the match
        index pairs when ``return_matches``.
        """
        kp_src, desc_src = features_src
        kp_dst, desc_dst = features_dst
        if len(kp_src) == 0 or len(kp_dst) == 0:
            empty = np.zeros((0, 2))
            return (empty, empty, np.zeros((0, 2), int)) if return_matches \
                else (empty, empty)
        score = desc_src @ desc_dst.T  # cosine similarity
        best = np.argmax(score, axis=1)
        quality = score[np.arange(len(kp_src)), best]
        # Mutual best + keep strongest fraction (reference keep_percent).
        mutual = np.argmax(score, axis=0)[best] == np.arange(len(kp_src))
        order = np.argsort(quality)[::-1]
        keep = max(int(np.ceil(keep_percent * len(order))), 1)
        selected = np.array(
            [i for i in order[: 10 * keep] if mutual[i]][:keep], dtype=int
        )
        pts_src = np.asarray(kp_src, dtype=float)[selected]
        pts_dst = np.asarray(kp_dst, dtype=float)[best[selected]]
        if return_matches:
            matches = np.stack([selected, best[selected]], axis=1)
            return pts_src, pts_dst, matches
        return pts_src, pts_dst

    def find_matches(
        self,
        img_src,
        img_dst,
        mask_src: Optional[np.ndarray] = None,
        mask_dst: Optional[np.ndarray] = None,
    ):
        """Matched keypoint pairs ((N, 2) source voxels, (N, 2) dest voxels).

        Returns (pts_src, pts_dst, success).
        """
        a = self._gray(img_src)
        b = self._gray(img_dst)
        h = min(a.shape[0], b.shape[0])
        w = min(a.shape[1], b.shape[1])
        if mask_src is not None:
            a = np.where(np.asarray(mask_src)[: a.shape[0], : a.shape[1]], a, 0)
        if mask_dst is not None:
            b = np.where(np.asarray(mask_dst)[: b.shape[0], : b.shape[1]], b, 0)
        shift, quality = phase_correlation(
            jnp.asarray(a[:h, :w]), jnp.asarray(b[:h, :w])
        )
        shift = np.asarray(shift)
        if not np.isfinite(shift).all():
            return np.zeros((0, 2)), np.zeros((0, 2)), False
        pts_src = self.detect(a).astype(float)
        if len(pts_src) == 0:
            return np.zeros((0, 2)), np.zeros((0, 2)), False
        pts_dst = pts_src + shift[None, :]
        inside = (
            (pts_dst[:, 0] >= 0)
            & (pts_dst[:, 0] < b.shape[0])
            & (pts_dst[:, 1] >= 0)
            & (pts_dst[:, 1] < b.shape[1])
        )
        return pts_src[inside], pts_dst[inside], bool(inside.any())
