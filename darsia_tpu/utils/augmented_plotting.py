"""Plot helpers overlaying analysis results on images.

Parity: reference ``utils/augmented_plotting.py:12-200``.
Headless-safe (Agg); figures are returned and optionally saved.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

__all__ = [
    "plot_contour_on_image",
    "plot_distribution_on_image",
    "plot_image_statistics",
]


def _background(ax, image):
    data = np.asarray(image.img if hasattr(image, "img") else image)
    ax.imshow(np.clip(data, 0, 1) if data.ndim == 3 else data)


def plot_contour_on_image(
    image,
    mask,
    color: str = "g",
    linewidth: float = 2.0,
    title: str = "",
    path: Optional[Path] = None,
    show: bool = False,
):
    """Overlay the contour of a boolean mask on an image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    _background(ax, image)
    ax.contour(
        np.asarray(mask.img if hasattr(mask, "img") else mask, dtype=float),
        levels=[0.5],
        colors=[color],
        linewidths=linewidth,
    )
    ax.set_title(title)
    ax.set_axis_off()
    if path is not None:
        fig.savefig(path, dpi=200, bbox_inches="tight")
    if not show:
        plt.close(fig)
    return fig


def plot_distribution_on_image(
    image,
    distribution,
    alpha: float = 0.5,
    cmap: str = "viridis",
    title: str = "",
    path: Optional[Path] = None,
    show: bool = False,
):
    """Overlay a scalar field semi-transparently on an image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    _background(ax, image)
    field = np.asarray(
        distribution.img if hasattr(distribution, "img") else distribution
    )
    im = ax.imshow(field, alpha=alpha, cmap=cmap)
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    ax.set_axis_off()
    if path is not None:
        fig.savefig(path, dpi=200, bbox_inches="tight")
    if not show:
        plt.close(fig)
    return fig


def plot_image_statistics(
    image,
    axis: int = 0,
    title: str = "",
    path: Optional[Path] = None,
    show: bool = False,
):
    """Plot per-row/column mean and std of a scalar image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.asarray(image.img if hasattr(image, "img") else image)
    if data.ndim == 3:
        data = data.mean(axis=-1)
    mean = data.mean(axis=1 - axis)
    std = data.std(axis=1 - axis)
    fig, ax = plt.subplots()
    x = np.arange(mean.size)
    ax.plot(x, mean, label="mean")
    ax.fill_between(x, mean - std, mean + std, alpha=0.3, label="±std")
    ax.set_title(title)
    ax.legend()
    if path is not None:
        fig.savefig(path, dpi=200, bbox_inches="tight")
    if not show:
        plt.close(fig)
    return fig
