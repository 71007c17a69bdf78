"""Image-porosity analysis from baseline colors.

Parity: reference ``presets/analysis/porosity.py:14-420`` (PorosityAnalysis,
patched_porosity_analysis).  The "custom" interactive mode is replaced by
explicit sample boxes.
"""

from __future__ import annotations

import logging
from typing import Literal, Optional
from warnings import warn

import numpy as np

from ...image.arithmetics import zeros_like
from ...utils.box import random_patches
from ...utils.extractcharacteristicdata import extract_characteristic_data
from ...utils.masks import Masks
from .multichromatictracer import MultichromaticTracerAnalysis

logger = logging.getLogger(__name__)

__all__ = ["PorosityAnalysis", "patched_porosity_analysis"]


class PorosityAnalysis(MultichromaticTracerAnalysis):
    """Map baseline colors to a porosity field per label.

    Colors near a label's dominant (sand) colors get porosity 1; colors far
    away (grains, residues) get porosity proportional to color proximity.
    """

    def __init__(
        self,
        baseline,
        labels=None,
        mode: Literal["full", "random_samples", "custom"] = "random_samples",
        num_clusters: int = 5,
        num_attempts: int = 10,
        num_iterations: int = 100,
        eps: float = 1e-2,
        tol_color_distance: float = 0.1,
        tol_color_gradient: float = 0.02,
        debug: bool = False,
        **kwargs,
    ) -> None:
        if labels is None:
            labels = zeros_like(baseline, mode="voxels", dtype=np.uint8)
        super().__init__(
            baseline,
            labels=labels,
            relative=False,
            show_plot=False,
            use_tvd=False,
            **kwargs,
        )

        base_arr = np.clip(np.asarray(baseline.img, dtype=float), 0, 1)
        gradient = np.sqrt(
            sum(
                np.gradient(base_arr[..., i], axis=j) ** 2
                for i in range(base_arr.shape[-1])
                for j in range(2)
            )
        )

        colors, concentrations = [], []
        for mask in Masks(labels):
            mask_arr = np.asarray(mask.img)
            mask_size = max(int(mask_arr.sum()), 1)
            gradient_mask = float(gradient[mask_arr].sum()) / mask_size

            if mode == "full":
                samples = [(slice(0, None), slice(0, None))]
                warn(
                    "Full mode is time-consuming; consider random_samples.",
                    RuntimeWarning,
                )
            elif mode == "random_samples":
                width = int(kwargs.get("sample_width", 50))
                num_patches = int(kwargs.get("sample_num", 10))
                samples = random_patches(
                    mask_arr.shape,
                    width=width,
                    num_patches=num_patches,
                    rng=np.random.default_rng(kwargs.get("seed", 42)),
                )
            elif mode == "custom":
                samples = kwargs.get("samples")
                if samples is None:
                    raise ValueError(
                        "custom mode requires explicit 'samples' boxes."
                    )
            else:
                raise ValueError(f"Unknown porosity mode {mode!r}.")

            labels_collection, palette_collection = extract_characteristic_data(
                base_arr,
                mask=mask_arr,
                samples=samples,
                num_clusters=num_clusters,
                num_attempts=num_attempts,
                num_iterations=num_iterations,
                eps=eps,
                mode="all",
                show_plot=debug,
            )

            colors_mask, concentrations_mask = [], []
            for cluster_labels, palette in zip(
                labels_collection, palette_collection
            ):
                counts = np.bincount(
                    np.asarray(cluster_labels).ravel(),
                    minlength=len(palette),
                )
                dominant = palette[int(np.argmax(counts))]
                for center in palette:
                    distance = float(np.linalg.norm(center - dominant))
                    # Dominant (sand) colors -> porosity 1; distant colors
                    # -> reduced porosity, harsher in low-gradient regions.
                    if distance < tol_color_distance or (
                        gradient_mask < tol_color_gradient
                    ):
                        value = 1.0
                    else:
                        value = float(
                            np.clip(1.0 - distance / (2 * tol_color_distance), 0, 1)
                        )
                    colors_mask.append(center)
                    concentrations_mask.append(value)

            colors.append(np.vstack(colors_mask))
            concentrations.append(np.asarray(concentrations_mask))

        self.calibrate(colors, concentrations)

    def __call__(self, img):
        porosity = super().__call__(img)
        porosity.img = np.clip(np.asarray(porosity.img), 0, 1)
        return porosity

    def cut_off_small_values(self, porosity, threshold: float = 0.5):
        out = porosity.copy()
        arr = np.clip(np.asarray(out.img), 0, 1)
        arr[arr < threshold] = 0
        out.img = arr
        return out


def patched_porosity_analysis(
    baseline,
    patches: tuple = (1, 1),
    labels=None,
    mode: Literal["full", "random_samples", "custom"] = "random_samples",
    num_clusters: int = 5,
    num_attempts: int = 10,
    num_iterations: int = 100,
    eps: float = 1e-2,
    debug: bool = False,
    **kwargs,
):
    """Per-patch porosity analysis stitched into one image
    (reference porosity.py:345-420)."""
    porosity = zeros_like(baseline, mode="voxels", dtype=float)
    porosity_arr = np.asarray(porosity.img).copy()
    num_voxels = np.asarray(baseline.num_voxels[:2])
    patch_size = np.ceil(num_voxels / np.asarray(patches)).astype(int)
    if labels is None:
        labels = zeros_like(baseline, mode="voxels", dtype=np.uint8)
    for i in range(patches[0]):
        for j in range(patches[1]):
            subregion = (
                slice(i * patch_size[0], (i + 1) * patch_size[0]),
                slice(j * patch_size[1], (j + 1) * patch_size[1]),
            )
            sub_baseline = baseline.subregion(subregion)
            sub_labels = labels.subregion(subregion)
            if any(s == 0 for s in np.asarray(sub_baseline.img).shape[:2]):
                continue
            try:
                analysis = PorosityAnalysis(
                    baseline=sub_baseline,
                    labels=sub_labels,
                    mode=mode,
                    num_clusters=num_clusters,
                    num_attempts=num_attempts,
                    num_iterations=num_iterations,
                    eps=eps,
                    debug=debug,
                    **kwargs,
                )
                porosity_arr[subregion] = np.asarray(
                    analysis(sub_baseline).img
                )
            except Exception as e:
                warn(f"Porosity analysis failed for {subregion}: {e}")
                porosity_arr[subregion] = 1.0
    porosity.img = porosity_arr
    return porosity
