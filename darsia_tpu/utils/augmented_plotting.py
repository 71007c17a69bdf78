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


def _as_mpl_color(color):
    """Accept matplotlib color strings or RGB triples (0-1 or 0-255)."""
    if isinstance(color, str):
        return color
    rgb = np.asarray(color, dtype=float)
    if rgb.max() > 1.0:
        rgb = rgb / 255.0
    return tuple(np.clip(rgb, 0, 1).tolist())


def plot_contour_on_image(
    image=None,
    mask=None,
    color="g",
    linewidth: float = 2.0,
    title: str = "",
    path: Optional[Path] = None,
    show: bool = False,
    *,
    img=None,
    alpha=None,
    thickness: Optional[float] = None,
    show_plot: Optional[bool] = None,
    return_image: bool = False,
):
    """Overlay mask contours on an image.

    Accepts one mask or a list of masks with matching color/alpha lists
    (the reference's multi-contour form, augmented_plotting.py:12); the
    singular form remains supported.  ``return_image`` renders to an RGB
    array and returns it as an OpticalImage-compatible array.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if img is not None:
        image = img
    if thickness is not None:
        linewidth = thickness
    if show_plot is not None:
        show = show_plot
    masks = mask if isinstance(mask, (list, tuple)) else [mask]
    is_single_rgb = (
        isinstance(color, (list, tuple))
        and len(color) in (3, 4)
        and all(isinstance(c, (int, float)) for c in color)
    )
    if isinstance(color, str) or is_single_rgb:
        colors = [color] * len(masks)
    else:
        colors = list(color)
    if alpha is None:
        alphas = [1.0] * len(masks)
    else:
        alphas = alpha if isinstance(alpha, (list, tuple)) else [alpha]
    fig, ax = plt.subplots()
    _background(ax, image)
    for m, c, a in zip(masks, colors, alphas):
        data = np.asarray(m.img if hasattr(m, "img") else m, dtype=float)
        ax.contour(
            data,
            levels=[0.5],
            colors=[_as_mpl_color(c)],
            linewidths=linewidth,
            alpha=float(np.clip(a, 0.05, 1.0)),
        )
    ax.set_title(title)
    ax.set_axis_off()
    if path is not None:
        fig.savefig(path, dpi=200, bbox_inches="tight")
    out = fig
    if return_image:
        fig.canvas.draw()
        rgba = np.asarray(fig.canvas.buffer_rgba())
        out = rgba[..., :3].copy()
    if not show:
        plt.close(fig)
    return out


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
