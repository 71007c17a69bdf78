"""Patch-wise translation analysis (deformation estimation).

Parity: reference
``src/darsia/multi_image_analysis/translationanalysis.py:18-876``.

TPU-native redesign of the hot path: instead of a Python loop running
ORB+RANSAC per patch (reference), all patch windows are extracted as one
batched array and a **vmapped FFT phase correlation** estimates every patch
translation in a single fused XLA program.  The scattered patch
displacements (+ FluidFlower boundary conditions) are interpolated with a
thin-plate-spline RBF — a dense solve + one big matmul over all pixels
(MXU-shaped) — and images are aligned with a single warp-kernel pass
(replacing the per-patch cv2.warpPerspective mosaic).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..image.image import Image
from ..image.patches import Patches
from ..ops.color import rgb_to_gray
from ..ops.fft import (
    phase_correlation,
    phase_correlation_prepared,
    prepare_phase_reference,
)
from ..ops.warp import identity_grid, warp
from ..utils.interpolation import rbf_interpolate

__all__ = ["TranslationAnalysis"]


def _to_gray(arr: jnp.ndarray) -> jnp.ndarray:
    if arr.ndim == 3:
        return rgb_to_gray(arr.astype(jnp.float32))
    return arr.astype(jnp.float32)


class TranslationAnalysis:
    """Estimate and apply a smooth displacement aligning images to a base."""

    def __init__(
        self,
        base: Image,
        N_patches: list,
        rel_overlap: float,
        translation_estimator=None,
        mask: Optional[Image] = None,
        quality_tol: float = 0.03,
    ) -> None:
        if base.space_dim != 2:
            raise NotImplementedError
        self.N_patches = list(N_patches)
        self.rel_overlap = rel_overlap
        self.translation_estimator = translation_estimator
        self.quality_tol = quality_tol
        self.update_base(base)
        self.translation = lambda arg: np.zeros((2, len(np.atleast_2d(arg))))
        self.have_translation = np.zeros(tuple(self.N_patches), dtype=bool)
        self._displacement_data = None  # (centers_xy, disp_x, disp_y)
        self.mask_base = mask

    # ---------------------------------------------------------------- setup

    def update_params(self, N_patches=None, rel_overlap=None) -> None:
        changed = False
        if N_patches is not None and N_patches != self.N_patches:
            self.N_patches = list(N_patches)
            changed = True
        if rel_overlap is not None and rel_overlap != self.rel_overlap:
            self.rel_overlap = rel_overlap
            changed = True
        if changed:
            self.update_base_patches()

    def update_base(self, base: Image) -> None:
        self.base = base
        self.update_base_patches()

    def update_base_patches(self) -> None:
        self.patches_base = Patches(
            self.base, self.N_patches, rel_overlap=self.rel_overlap
        )

    def load_image(self, img: Image, mask: Optional[Image] = None) -> None:
        self.img = img
        self.mask_img = mask

    def deduct_translation_analysis(self, other: "TranslationAnalysis") -> None:
        """Copy the displacement state from another analysis."""
        self.translation = other.translation
        self.have_translation = other.have_translation.copy()
        self._displacement_data = other._displacement_data

    def add_translation_analysis(self, other: "TranslationAnalysis") -> None:
        """Compose: add another analysis' displacement to this one."""
        first = self.translation
        second = other.translation

        def combined(arg):
            return np.asarray(first(arg)) + np.asarray(second(arg))

        self.translation = combined

    # ------------------------------------------------------------- analysis

    def _window_geometry(self):
        nv = self.base.num_voxels
        pv = [int(np.ceil(nv[i] / self.N_patches[i])) for i in range(2)]
        ov = [int(np.ceil(self.rel_overlap * pv[i])) for i in range(2)]
        win = (pv[0] + 2 * ov[0], pv[1] + 2 * ov[1])
        centers = self.patches_base.centers_voxels.reshape(-1, 2)
        return win, centers

    @staticmethod
    def _extract_windows(arr: jnp.ndarray, centers: jnp.ndarray, win):
        """Batched extraction of fixed-size windows around centers."""
        limits = jnp.array(
            [arr.shape[0] - win[0], arr.shape[1] - win[1]], dtype=jnp.int32
        )

        def get(c):
            start = jnp.clip(
                c.astype(jnp.int32) - jnp.array(win, dtype=jnp.int32) // 2,
                0,
                limits,
            )
            return lax.dynamic_slice(arr, (start[0], start[1]), win)

        return jax.vmap(get)(centers)

    def find_translation(self, units: list = ["pixel", "pixel"]) -> tuple:
        """Estimate the displacement field img -> base.

        Returns the displacement as a callable (pixel/metric units per
        ``units``) plus a success flag.
        """
        assert all(unit in ["metric", "pixel"] for unit in units)
        win, centers = self._window_geometry()

        img_gray = _to_gray(jnp.asarray(self.img.img))
        centers_j = jnp.asarray(centers, dtype=jnp.int32)
        # The baseline spectra are fixed across a time series: precompute
        # conj(F(base windows)) once and reuse (one forward FFT per image).
        cache_key = (tuple(win), centers.tobytes())
        if getattr(self, "_base_spectra_key", None) != cache_key:
            base_gray = _to_gray(jnp.asarray(self.base.img))
            base_windows = self._extract_windows(base_gray, centers_j, win)
            self._base_spectra = jax.vmap(prepare_phase_reference)(base_windows)
            self._base_spectra_key = cache_key
        img_windows = self._extract_windows(img_gray, centers_j, win)

        # One fused program: phase correlation across all patches.
        shifts, qualities = jax.vmap(
            lambda f, w: phase_correlation_prepared(f, w, tuple(win))
        )(self._base_spectra, img_windows)
        shifts = np.asarray(shifts)  # (N, 2) in (row, col)
        qualities = np.asarray(qualities)

        have = qualities > self.quality_tol
        self.have_translation = have.reshape(tuple(self.N_patches))

        # Collect accepted displacements in (x, y) = (col, row) convention.
        accepted = np.where(have)[0]
        centers_xy = np.stack([centers[:, 1], centers[:, 0]], axis=1)
        input_coords = [centers_xy[k] for k in accepted]
        disp_x = [float(shifts[k, 1]) for k in accepted]
        disp_y = [float(shifts[k, 0]) for k in accepted]

        if units[0] == "metric":
            coords = self.base.coordinatesystem.coordinate(
                np.stack([centers[:, 0], centers[:, 1]], axis=1)
            )
            input_coords = [np.asarray(coords[k]) for k in accepted]
        if units[1] == "metric":
            vs = self.base.voxel_size
            disp_x = [d * vs[1] for d in disp_x]
            disp_y = [-d * vs[0] for d in disp_y]

        # Boundary conditions (FluidFlower defaults; see bc_x/bc_y).
        bc_coords_x, bc_vals_x = self.bc_x(units)
        bc_coords_y, bc_vals_y = self.bc_y(units)

        pts_x = np.array(input_coords + bc_coords_x)
        pts_y = np.array(input_coords + bc_coords_y)
        vals_x = np.array(disp_x + bc_vals_x)
        vals_y = np.array(disp_y + bc_vals_y)

        self._displacement_data = (pts_x, vals_x, pts_y, vals_y)

        def translation_callable(arg):
            arg = np.atleast_2d(np.asarray(arg, dtype=float))
            tx = np.asarray(rbf_interpolate(pts_x, vals_x, jnp.asarray(arg)))
            ty = np.asarray(rbf_interpolate(pts_y, vals_y, jnp.asarray(arg)))
            return np.array([tx, ty])

        self.translation = translation_callable
        return self.translation, bool(have.any())

    def bc_x(self, units: list) -> tuple:
        """Zero x-displacement on the vertical boundaries (overridable)."""
        boundary = []
        if units[0] == "metric":
            for y in np.linspace(0, self.base.dimensions[0], self.N_patches[0] + 1):
                boundary.append(np.asarray(self.base.origin) + np.array([0, -y]))
                boundary.append(
                    np.asarray(self.base.origin)
                    + np.array([self.base.dimensions[1], -y])
                )
        else:
            for y in np.linspace(0, self.base.num_voxels[0], self.N_patches[0] + 1):
                boundary.append(np.array([0.0, y]))
                boundary.append(np.array([float(self.base.num_voxels[1]), y]))
        return boundary, len(boundary) * [0.0]

    def bc_y(self, units: list) -> tuple:
        """Zero y-displacement on the bottom boundary (overridable)."""
        boundary = []
        if units[0] == "metric":
            for x in np.linspace(0, self.base.dimensions[1], self.N_patches[1] + 1):
                boundary.append(
                    np.asarray(self.base.origin)
                    + np.array([x, -self.base.dimensions[0]])
                )
        else:
            for x in np.linspace(0, self.base.num_voxels[1], self.N_patches[1] + 1):
                boundary.append(np.array([x, float(self.base.num_voxels[0])]))
        return boundary, len(boundary) * [0.0]

    def return_patch_translation(
        self, reverse: bool = True, units: str = "metric"
    ) -> np.ndarray:
        """Displacement at the patch centers."""
        centers = self.patches_base.centers_voxels.reshape(-1, 2)
        centers_xy = np.stack([centers[:, 1], centers[:, 0]], axis=1)
        disp = np.asarray(self.translation(centers_xy)).T  # (N, 2) in (x, y)
        if reverse:
            disp = -disp
        if units == "metric":
            vs = self.base.voxel_size
            disp = np.stack([disp[:, 0] * vs[1], -disp[:, 1] * vs[0]], axis=1)
        return disp.reshape((*self.N_patches, 2))

    def plot_translation(
        self,
        reverse: bool = False,
        scaling: float = 1.0,
        mask: Optional[Image] = None,
    ) -> None:  # pragma: no cover - visual
        """Quiver plot of the patch-center displacements over the base
        image (reference translationanalysis.py:560-615)."""
        import matplotlib.pyplot as plt

        disp = self.return_patch_translation(reverse=reverse, units="pixel")
        centers = self.patches_base.centers_voxels.reshape(-1, 2)
        flat = disp.reshape(-1, 2)
        fig, ax = plt.subplots(num="translation analysis")
        base = np.asarray(self.base.img)
        if mask is not None:
            base = np.where(
                np.asarray(mask.img, dtype=bool)[..., None]
                if base.ndim == 3
                else np.asarray(mask.img, dtype=bool),
                base,
                0,
            )
        ax.imshow(base if base.ndim == 2 else np.clip(base, 0, 1))
        ax.quiver(
            centers[:, 1],
            centers[:, 0],
            scaling * flat[:, 0],
            -scaling * flat[:, 1],
            color="white",
            angles="xy",
            scale_units="xy",
            scale=1,
        )
        plt.show()

    # ----------------------------------------------------------- application

    def displacement_field(self, shape) -> jnp.ndarray:
        """Dense (2, H, W) displacement in (row, col) voxel units."""
        if self._displacement_data is None:
            return jnp.zeros((2, *shape), dtype=jnp.float32)
        pts_x, vals_x, pts_y, vals_y = self._displacement_data
        H, W = shape
        rows, cols = np.meshgrid(
            np.arange(H, dtype=float), np.arange(W, dtype=float), indexing="ij"
        )
        query = np.stack([cols.ravel(), rows.ravel()], axis=1)  # (x, y)
        dx = np.asarray(rbf_interpolate(pts_x, vals_x, jnp.asarray(query)))
        dy = np.asarray(rbf_interpolate(pts_y, vals_y, jnp.asarray(query)))
        return jnp.stack(
            [
                jnp.asarray(dy.reshape(H, W), dtype=jnp.float32),
                jnp.asarray(dx.reshape(H, W), dtype=jnp.float32),
            ],
            axis=0,
        )

    def translate_image(self, img: Optional[Image] = None, reverse: bool = True):
        """Warp an image by the estimated displacement (one gather pass)."""
        if img is None:
            img = self.img
        data = jnp.asarray(img.img)
        shape = tuple(data.shape[:2])
        disp = self.displacement_field(shape)
        sign = -1.0 if reverse else 1.0
        coords = identity_grid(shape) + sign * disp
        dtype = data.dtype
        out = warp(data.astype(jnp.float32), coords, order=1)
        if jnp.issubdtype(dtype, jnp.integer):
            out = jnp.round(out)
        result = img.copy()
        result.img = out.astype(dtype)
        return result

    def __call__(self, img: Image, mask=None) -> Image:
        """Full pipeline: estimate displacement of img, return aligned image."""
        self.load_image(img, mask=mask)
        self.find_translation()
        return self.translate_image()
