"""Threshold-based segmentation masks + contour overlays.

Parity: reference ``presets/workflows/segmentation_contours.py:26-280``.
Contours are drawn with matplotlib (Agg) rather than cv2.drawContours.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .mode_resolution import resolve_mode_image

__all__ = [
    "SimpleSegmentation",
    "GradientBasedSegmentation",
    "SegmentationContours",
]


class SimpleSegmentation:
    """One threshold of one analysis mode -> boolean mask."""

    def __init__(self, mode: str, threshold: float) -> None:
        self.mode = mode
        self.threshold = float(threshold)

    def extract_mask(
        self,
        image,
        mass_analysis_result=None,
        color_embedding_registry=None,
        color_embedding_runtime=None,
        scalar_products=None,
    ) -> np.ndarray:
        field = resolve_mode_image(
            self.mode,
            image,
            mass_analysis_result=mass_analysis_result,
            color_embedding_registry=color_embedding_registry,
            color_embedding_runtime=color_embedding_runtime,
            scalar_products=scalar_products,
        )
        return np.asarray(field.img) > self.threshold

    __call__ = extract_mask


class GradientBasedSegmentation(SimpleSegmentation):
    """Threshold on the gradient modulus of the mode image."""

    def extract_mask(self, image, **kwargs) -> np.ndarray:
        field = resolve_mode_image(self.mode, image, **kwargs)
        arr = np.asarray(field.img, dtype=float)
        grad = np.sqrt(
            sum(np.gradient(arr, axis=axis) ** 2 for axis in range(2))
        )
        return grad > self.threshold


class SegmentationContours:
    """Extract masks for several thresholds and overlay their contours."""

    def __init__(self, config) -> None:
        """``config``: SegmentationConfig (mode, thresholds, color, alpha,
        linewidth, contour_smoother)."""
        self.config = config

    @property
    def requested_modes(self) -> set:
        return {self.config.mode}

    def extract_mask(self, image, threshold: float, **kwargs) -> np.ndarray:
        return SimpleSegmentation(self.config.mode, threshold).extract_mask(
            image, **kwargs
        )

    def add_contours(
        self, background, masks: list, path=None, show: bool = False
    ):
        """Overlay contours of the masks on the background image; save to
        ``path`` when given.  Returns the matplotlib figure."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        data = np.asarray(
            background.img if hasattr(background, "img") else background
        )
        ax.imshow(np.clip(data, 0, 1) if data.ndim == 3 else data)
        colors = self.config.color or [[255, 255, 255]] * len(masks)
        for i, mask in enumerate(masks):
            color = np.asarray(
                colors[i % len(colors)]
                if isinstance(colors[0], (list, tuple))
                else colors,
                dtype=float,
            )
            ax.contour(
                np.asarray(mask, dtype=float),
                levels=[0.5],
                colors=[tuple(np.clip(color / 255.0, 0, 1))],
                linewidths=self.config.linewidth,
            )
        ax.set_axis_off()
        if path is not None:
            fig.savefig(path, dpi=200, bbox_inches="tight")
        if not show:
            plt.close(fig)
        return fig

    def __call__(
        self, image, background=None, path=None, show: bool = False, **kwargs
    ):
        masks = [
            self.extract_mask(image, threshold, **kwargs)
            for threshold in self.config.thresholds
        ]
        return self.add_contours(
            background if background is not None else image,
            masks,
            path=path,
            show=show,
        )
