"""Plotting / export helpers (VTK export without pyevtk, overlay plots).

Parity: reference ``src/darsia/utils/plotting.py`` (pyevtk replaced by a
self-contained legacy-ASCII VTK writer).
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np

from .formats import Format

__all__ = ["to_vtk", "plot_2d_wasserstein_distance"]


def to_vtk(path: Union[str, Path], data: list) -> None:
    """Write named arrays to a legacy-ASCII VTK structured-points file.

    Args:
        path: output path (suffix .vtk enforced).
        data: list of (name, array_or_image[, Format]) tuples; arrays must
            share the same spatial shape.

    """
    path = Path(path).with_suffix(".vtk")
    path.parent.mkdir(parents=True, exist_ok=True)

    normalized = []
    for item in data:
        if len(item) == 3:
            name, array, fmt = item
        else:
            name, array = item
            fmt = Format.SCALAR
        if hasattr(array, "img"):
            array = np.asarray(array.img)
        normalized.append((name, np.asarray(array), fmt))

    spatial_shape = normalized[0][1].shape[:2]
    ny, nx = spatial_shape[0], spatial_shape[1]
    nz = 1

    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\n")
        f.write("darsia_tpu export\n")
        f.write("ASCII\n")
        f.write("DATASET STRUCTURED_POINTS\n")
        f.write(f"DIMENSIONS {nx} {ny} {nz}\n")
        f.write("ORIGIN 0 0 0\n")
        f.write("SPACING 1 1 1\n")
        f.write(f"POINT_DATA {nx * ny * nz}\n")
        for name, array, fmt in normalized:
            flat = array.reshape(ny, nx, -1)
            if fmt == Format.VECTOR and flat.shape[-1] >= 2:
                f.write(f"VECTORS {name} float\n")
                for row in range(ny - 1, -1, -1):
                    for col in range(nx):
                        v = flat[row, col]
                        vx = v[1] if len(v) > 1 else 0.0
                        vy = -v[0]
                        vz = v[2] if len(v) > 2 else 0.0
                        f.write(f"{vx} {vy} {vz}\n")
            else:
                f.write(f"SCALARS {name} float 1\n")
                f.write("LOOKUP_TABLE default\n")
                for row in range(ny - 1, -1, -1):
                    for col in range(nx):
                        f.write(f"{float(flat[row, col, 0])}\n")


def plot_2d_wasserstein_distance(info: dict, **kwargs) -> None:  # pragma: no cover
    """Quiver/contour overlay of a Wasserstein solution (matplotlib)."""
    import matplotlib.pyplot as plt

    flux = np.asarray(info["flux"])
    pressure = np.asarray(info["pressure"])
    mass_diff = np.asarray(info["mass_diff"])

    fig, axs = plt.subplots(1, 3, figsize=(15, 5))
    axs[0].imshow(mass_diff)
    axs[0].set_title("mass difference")
    axs[1].imshow(pressure)
    axs[1].set_title("pressure")
    axs[2].imshow(np.linalg.norm(flux, axis=-1))
    step = max(flux.shape[0] // 20, 1)
    Y, X = np.mgrid[0 : flux.shape[0] : step, 0 : flux.shape[1] : step]
    axs[2].quiver(
        X,
        Y,
        flux[::step, ::step, 1],
        -flux[::step, ::step, 0],
        color="white",
        scale=kwargs.get("scale", None),
    )
    axs[2].set_title("flux / transport density")
    if kwargs.get("path"):
        plt.savefig(kwargs["path"], dpi=kwargs.get("dpi", 300))
    if kwargs.get("show", True):
        plt.show()
    else:
        plt.close()
