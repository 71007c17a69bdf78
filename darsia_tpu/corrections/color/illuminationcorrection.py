"""Local illumination (white-balance) correction.

Parity: reference ``src/darsia/corrections/color/illuminationcorrection.py``.

Workflow: sample patches across the image (optionally restricted by a mask),
extract characteristic colors per sample, solve for per-sample scaling
factors that harmonize colors within sample groups, interpolate the scaling
to a full-resolution field, and multiply it onto images.

TPU-first notes: the inner optimization exploits that interpolation is a
*linear* operator on the scaling values — the hat matrix is built once and
the bounded least-squares problem is solved with L-BFGS-B on a cheap
quadratic objective (the reference re-interpolates on every objective
evaluation).  The application is a fused elementwise multiply.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Literal, Optional

import jax.numpy as jnp
import numpy as np

from ...image.image import ScalarImage
from ...utils.extractcharacteristicdata import extract_characteristic_data
from ...utils.interpolation import (
    interpolate_to_image,
    polynomial_design_matrix,
)
from ...utils.point import CoordinateArray, VoxelArray, make_voxel
from ..base import BaseCorrection

logger = logging.getLogger(__name__)

__all__ = ["IlluminationCorrection"]


class IlluminationCorrection(BaseCorrection):
    """Spatially varying white balance fit from image samples."""

    # ------------------------------------------------------------- sampling

    def select_random_samples(self, mask, config) -> list[tuple[slice, ...]]:
        """Sample random square patches within the masked region.

        Args:
            mask: boolean image/array of eligible pixels.
            config: object with attributes ``width``, ``num_samples``,
                ``seed`` (e.g. IlluminationCorrectionConfig).

        """
        np.random.seed(config.seed)
        width = config.width
        num_samples = config.num_samples
        mask_arr = np.asarray(mask if isinstance(mask, np.ndarray) else mask.img)

        larger_mask = np.zeros(
            (mask_arr.shape[0] + width, mask_arr.shape[1] + width), dtype=bool
        )
        larger_mask[: mask_arr.shape[0], : mask_arr.shape[1]] = mask_arr

        indices = np.nonzero(mask_arr)
        moved = tuple(indices[i] + width for i in range(len(indices)))
        valid = larger_mask[moved]
        restricted = tuple(indices[i][valid] for i in range(len(indices)))

        num_eligible = len(restricted[0])
        if num_eligible == 0:
            logger.warning("No eligible points for sampling found.")
            return []
        random_ids = np.unique(
            (np.random.rand(num_samples) * num_eligible).astype(int)
        )
        sample_indices = np.transpose(
            tuple(restricted[i][random_ids] for i in range(len(indices)))
        )
        return [
            (slice(s[0], s[0] + width), slice(s[1], s[1] + width))
            for s in sample_indices
        ]

    # ---------------------------------------------------------------- setup

    def setup(
        self,
        base,
        sample_groups: list[list[tuple[slice, ...]]],
        mask=None,
        outliers: float = 0.0,
        filter: callable = lambda x: x,
        colorspace: Literal[
            "rgb", "rgb-scalar", "lab", "lab-scalar", "hsl", "hsl-scalar", "gray"
        ] = "hsl-scalar",
        interpolation: Literal["rbf", "quartic", "illumination"] = "quartic",
        bounds: tuple[float, float] = (0.5, 2.0),
        show_plot: bool = False,
        log: Optional[Path] = None,
    ) -> None:
        """Fit the local scaling field from sample groups on base image(s)."""
        from scipy.optimize import minimize

        if hasattr(base, "img"):
            base = [base]
        self.colorspace = colorspace.lower()
        images = self._convert_images(base)

        # Characteristic colors per (group, image).
        characteristic_colors = {}
        for group_id, samples in enumerate(sample_groups):
            for image_id, image in enumerate(images):
                characteristic_colors[(group_id, image_id)] = (
                    extract_characteristic_data(
                        signal=image, mask=mask, samples=samples, filter=filter
                    )
                )

        skipped_groups = [
            g
            for g, samples in enumerate(sample_groups)
            if sum(
                len(characteristic_colors[(g, i)]) for i in range(len(images))
            )
            == 0
        ]
        active_groups = [
            g for g in range(len(sample_groups)) if g not in skipped_groups
        ]
        num_samples = [len(sample_groups[g]) for g in active_groups]

        method_is_trichromatic = self.colorspace in ("rgb", "lab", "hsl")
        color_components = 3 if method_is_trichromatic else 1

        # Sample centers in physical coordinates.
        mid_voxels = []
        for g in active_groups:
            for sample in sample_groups[g]:
                mid_voxels.append(
                    [
                        (sample[0].start + sample[0].stop) // 2,
                        (sample[1].start + sample[1].stop) // 2,
                    ]
                )
        mid_voxels = make_voxel(np.array(mid_voxels))
        mid_coordinates = base[0].coordinatesystem.coordinate(mid_voxels)
        self._mid_coordinates = np.asarray(mid_coordinates)
        self._interpolation = interpolation

        # Hat matrix: interpolation evaluated back at the sample centers is
        # linear in the nodal values.
        n = len(mid_voxels)
        if interpolation in ("linear", "quadratic", "cubic", "quartic"):
            degree = {"linear": 1, "quadratic": 2, "cubic": 3, "quartic": 4}[
                interpolation
            ]
            # Cap the degree like the interpolation does (overdetermined fit).
            while degree > 0 and (degree + 1) * (degree + 2) // 2 > n:
                degree -= 1
            X = polynomial_design_matrix(self._mid_coordinates, degree)
            hat = X @ np.linalg.pinv(X)
        else:
            # Exact interpolants reproduce nodal values.
            hat = np.eye(n)

        assert color_components == 1 or interpolation is not None

        # Quadratic objective: harmonize colors within each group.
        def objective(scaling: np.ndarray) -> float:
            s = scaling.reshape(-1, color_components)
            eff = hat @ s
            residual = 0.0
            offset = 0
            for gi, g in enumerate(active_groups):
                ns = num_samples[gi]
                block = slice(offset, offset + ns)
                for image_id in range(len(images)):
                    colors = characteristic_colors[(g, image_id)]
                    if len(colors) == 0:
                        continue
                    colors = np.asarray(colors).reshape(ns, color_components)
                    rescaled = eff[block] * colors
                    avg = rescaled.mean(axis=0)
                    true_rescaled = s[block] * colors
                    local = (true_rescaled - avg) ** 2
                    sorted_res = np.sort(local, axis=0)
                    trim = int(outliers * sorted_res.shape[0])
                    if trim == 0:
                        residual += float(np.sum(sorted_res))
                    else:
                        residual += float(np.sum(sorted_res[trim:-trim]))
                offset += ns
            return residual

        num_vars = sum(num_samples) * color_components
        result = minimize(
            objective,
            np.ones(num_vars),
            bounds=[bounds] * num_vars,
            method="L-BFGS-B",
            tol=1e-6,
            options={"maxiter": 1000, "ftol": 1e-10, "gtol": 1e-8},
        )
        scaling = result.x.reshape(-1, color_components)

        # Interpolate scaling to full-resolution fields.
        self.local_scaling = self._interpolate_scaling(
            scaling, base[0], interpolation
        )

        if show_plot:  # pragma: no cover - visual
            import matplotlib.pyplot as plt

            plt.imshow(np.asarray(self.local_scaling[0].img))
            plt.colorbar()
            plt.title("Scaling")
            plt.show()

    def _interpolate_scaling(self, scaling_values, base_image, interpolation):
        x = self._mid_coordinates[:, 0]
        y = self._mid_coordinates[:, 1]
        template = ScalarImage(
            np.zeros(base_image.num_voxels[:2], dtype=np.float32),
            **{
                k: v
                for k, v in base_image.metadata().items()
                if k not in ("scalar", "series", "date", "time", "reference_date")
            },
        )
        if self.colorspace == "rgb":
            return [
                interpolate_to_image(
                    (x, y, scaling_values[:, i]), template, method=interpolation
                )
                for i in range(3)
            ]
        component = {"lab": 0, "hsl": 1}.get(self.colorspace, 0)
        return [
            interpolate_to_image(
                (x, y, scaling_values[:, component if scaling_values.shape[1] > 1 else 0]),
                template,
                method=interpolation,
            )
        ]

    def _convert_images(self, base_images: list) -> list[np.ndarray]:
        from ...ops.color import convert_trichromatic, rgb_to_gray
        from ...utils.dtype import convert_dtype

        out = []
        for base in base_images:
            arr = np.asarray(base.img)
            if arr.dtype in (np.uint8, np.uint16):
                arr = np.asarray(convert_dtype(arr, np.float32))
            if self.colorspace in ("rgb", "rgb-scalar"):
                out.append(arr)
            elif self.colorspace == "lab":
                out.append(np.asarray(convert_trichromatic(jnp.asarray(arr), "RGB", "LAB")))
            elif self.colorspace == "lab-scalar":
                out.append(
                    np.asarray(convert_trichromatic(jnp.asarray(arr), "RGB", "LAB"))[..., 0]
                )
            elif self.colorspace == "hsl":
                out.append(np.asarray(convert_trichromatic(jnp.asarray(arr), "RGB", "HLS")))
            elif self.colorspace == "hsl-scalar":
                out.append(
                    np.asarray(convert_trichromatic(jnp.asarray(arr), "RGB", "HLS"))[..., 1]
                )
            elif self.colorspace == "gray":
                out.append(np.asarray(rgb_to_gray(jnp.asarray(arr))))
            else:
                raise ValueError(
                    "Invalid colorspace; choose rgb/lab/hsl(-scalar)/gray."
                )
        return out

    # ----------------------------------------------------------- correction

    def correct_array(self, img: jnp.ndarray) -> jnp.ndarray:
        img = jnp.asarray(img)
        if img.shape[-1] == 1:
            raise NotImplementedError("Only color images are supported.")
        if not hasattr(self, "local_scaling"):
            logger.info("No local scaling determined; returning original image.")
            return img
        assert img.shape[-1] == 3
        if self.colorspace == "rgb":
            scaling = jnp.stack(
                [jnp.asarray(self.local_scaling[i].img) for i in range(3)], axis=-1
            )
        else:
            scaling = jnp.asarray(self.local_scaling[0].img)[..., None]
        return img * scaling

    # ------------------------------------------------------------------ I/O

    def save(self, path: Path) -> None:
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            class_name=type(self).__name__,
            colorspace=self.colorspace,
            scaling_arrays=np.stack(
                [np.asarray(s.img) for s in self.local_scaling]
            ),
            dimensions=np.asarray(self.local_scaling[0].dimensions),
        )

    def load(self, path: Path) -> None:
        path = Path(path)
        if not path.is_file():
            raise FileNotFoundError(f"File {path} not found.")
        data = np.load(path, allow_pickle=True)
        self.colorspace = str(data["colorspace"])
        arrays = data["scaling_arrays"]
        dims = list(data["dimensions"])
        self.local_scaling = [
            ScalarImage(arrays[i], dimensions=dims) for i in range(arrays.shape[0])
        ]
