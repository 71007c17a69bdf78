"""Illustration PNG/JPG generation for setup artifacts.

Parity: reference ``presets/workflows/setup/illustrations.py:13-130``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["save_discrete_map_illustration", "save_scalar_map_illustration"]


def _to_2d(array: np.ndarray) -> np.ndarray:
    array = np.asarray(array)
    if array.ndim == 3 and array.shape[-1] == 1:
        return array[..., 0]
    if array.ndim != 2:
        raise ValueError(f"Expected 2d map, got shape {array.shape}.")
    return array


def save_scalar_map_illustration(
    data, path: Path, title: str = "", colorbar_label: str = ""
) -> Path:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = _to_2d(data.img if hasattr(data, "img") else data)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots()
    im = ax.imshow(arr)
    ax.set_title(title)
    fig.colorbar(im, ax=ax, label=colorbar_label)
    fig.savefig(path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return path


def save_discrete_map_illustration(
    data, path: Path, title: str = "", show_ids: bool = True
) -> Path:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy import ndimage

    arr = _to_2d(data.img if hasattr(data, "img") else data).astype(int)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots()
    ax.imshow(arr, cmap="tab20", interpolation="nearest")
    if show_ids:
        for label in np.unique(arr):
            center = ndimage.center_of_mass(arr == label)
            ax.text(
                center[1],
                center[0],
                str(int(label)),
                color="white",
                ha="center",
                va="center",
                fontsize=8,
                bbox={"facecolor": "black", "alpha": 0.5, "pad": 1},
            )
    ax.set_title(title)
    fig.savefig(path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return path
