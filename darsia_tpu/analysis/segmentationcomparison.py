"""Comparison of multiple segmentations: overlaps, unique regions, fractions.

Parity: reference
``src/darsia/multi_image_analysis/segmentationcomparison.py:21-700``.
"""

from __future__ import annotations

from itertools import combinations
from typing import Optional

import numpy as np

__all__ = ["SegmentationComparison"]


class SegmentationComparison:
    """Compare N segmentations (binary or labelled) of the same domain."""

    def __init__(self, number_of_segmented_images: int = 2, **kwargs) -> None:
        self.number_of_segmented_images = number_of_segmented_images
        self.component_names = kwargs.get(
            "component_names",
            [f"segmentation {i}" for i in range(number_of_segmented_images)],
        )
        # Distinct overlay colors (RGB), one per non-empty subset.
        base_colors = kwargs.get(
            "colors",
            np.array(
                [
                    [0.8, 0.1, 0.1],
                    [0.1, 0.1, 0.8],
                    [0.1, 0.8, 0.1],
                    [0.8, 0.8, 0.1],
                    [0.8, 0.1, 0.8],
                    [0.1, 0.8, 0.8],
                    [0.5, 0.5, 0.5],
                ]
            ),
        )
        self.colors = np.asarray(base_colors)

    @staticmethod
    def _binary(seg, value=None) -> np.ndarray:
        arr = np.asarray(seg.img if hasattr(seg, "img") else seg)
        if value is not None:
            return arr == value
        return arr.astype(bool)

    def get_combinations(self) -> list[tuple[int, ...]]:
        """All non-empty subsets of image indices, largest first."""
        indices = range(self.number_of_segmented_images)
        combos: list[tuple[int, ...]] = []
        for size in range(self.number_of_segmented_images, 0, -1):
            combos.extend(combinations(indices, size))
        return combos

    def compare_segmentations_binary_array(self, *segmentations) -> np.ndarray:
        """Comparison array: for each pixel, which segmentations claim it.

        Returns an integer array where bit i is set when segmentation i is
        active at the pixel.
        """
        masks = [self._binary(s) for s in segmentations]
        shape = masks[0].shape
        assert all(m.shape == shape for m in masks)
        out = np.zeros(shape, dtype=np.int32)
        for i, m in enumerate(masks):
            out |= m.astype(np.int32) << i
        return out

    def __call__(self, *segmentations, **kwargs) -> np.ndarray:
        """RGB overlay visualizing unique and overlapping regions."""
        code = self.compare_segmentations_binary_array(*segmentations)
        combos = self.get_combinations()
        rgb = np.zeros((*code.shape, 3), dtype=np.float32)
        for idx, combo in enumerate(combos):
            bits = sum(1 << i for i in combo)
            color = self.colors[idx % len(self.colors)]
            rgb[code == bits] = color
        return rgb

    def overlap(self, seg_a, seg_b) -> float:
        """Jaccard overlap of two binary segmentations."""
        a = self._binary(seg_a)
        b = self._binary(seg_b)
        union = float(np.logical_or(a, b).sum())
        if union == 0:
            return 1.0
        return float(np.logical_and(a, b).sum()) / union

    def color_fractions(self, comparison_rgb: np.ndarray) -> dict:
        """Area fraction per overlay color class."""
        flat = comparison_rgb.reshape(-1, 3)
        active = flat.any(axis=1)
        total = max(int(active.sum()), 1)
        fractions = {}
        combos = self.get_combinations()
        for idx, combo in enumerate(combos):
            color = self.colors[idx % len(self.colors)]
            match = np.all(np.isclose(flat, color, atol=1e-3), axis=1)
            fractions[combo] = float(match.sum()) / total
        return fractions

    def plot(self, comparison_rgb: np.ndarray, **kwargs) -> None:
        """Overlay plot with legend."""  # pragma: no cover - visual
        import matplotlib.pyplot as plt
        from matplotlib.patches import Patch

        fig, ax = plt.subplots()
        ax.imshow(comparison_rgb)
        patches = []
        for idx, combo in enumerate(self.get_combinations()):
            names = " & ".join(self.component_names[i] for i in combo)
            patches.append(
                Patch(color=self.colors[idx % len(self.colors)], label=names)
            )
        ax.legend(handles=patches, loc="upper right", fontsize=8)
        plt.show()

    def plot_overlay_segmentation(
        self, comparison_rgb: np.ndarray, base_image, opacity: float = 0.6, **kwargs
    ) -> None:  # pragma: no cover - visual
        import matplotlib.pyplot as plt

        base = np.asarray(
            base_image.img if hasattr(base_image, "img") else base_image,
            dtype=np.float32,
        )
        if base.max() > 1.5:
            base = base / 255.0
        active = comparison_rgb.any(axis=-1, keepdims=True)
        overlay = np.where(
            active, (1 - opacity) * base + opacity * comparison_rgb, base
        )
        plt.imshow(np.clip(overlay, 0, 1))
        plt.show()
