"""Image arithmetics: weighting, superposition, stacking.

Parity: reference ``src/darsia/image/arithmetics.py:15-249``.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from ..utils.point import make_coordinate
from .image import Image

__all__ = ["weight", "superpose", "stack", "zeros_like", "ones_like"]


def weight(img: Image, w) -> Image:
    """Scalar or element-wise weighting of an image."""
    weighted = img.copy()
    if isinstance(w, (float, int)) or (np.isscalar(w)):
        weighted.img = jnp.asarray(img.img) * float(w)
    elif isinstance(w, Image):
        data = jnp.asarray(w.img, dtype=jnp.float32)
        space_dim = img.space_dim
        if img.img.shape[:space_dim] != data.shape[:space_dim]:
            if space_dim != 2:
                raise NotImplementedError
            import jax

            data = jax.image.resize(
                data, tuple(img.img.shape[:2]), method="linear"
            )
        target = jnp.asarray(img.img, dtype=jnp.float32)
        if target.ndim > data.ndim:
            data = data.reshape(data.shape + (1,) * (target.ndim - data.ndim))
        weighted.img = target * data
    elif isinstance(w, np.ndarray) and np.allclose(
        w.shape, img.shape[img.space_dim :]
    ):
        # Spatially constant weight varying over time/range axes.
        target = jnp.asarray(img.img, dtype=jnp.float32)
        shape = (1,) * img.space_dim + tuple(w.shape)
        weighted.img = target * jnp.asarray(w, dtype=jnp.float32).reshape(shape)
    else:
        raise ValueError("Unsupported weight type/shape.")
    return weighted


def superpose(images: list) -> Image:
    """Sum images defined on (possibly different) coordinate systems.

    The result lives on the bounding box of all inputs at the finest common
    voxel size; each image is embedded by coordinate lookup.
    """
    assert all(img.space_dim == images[0].space_dim for img in images)
    assert all(img.scalar == images[0].scalar for img in images)
    if images[0].space_dim != 2:
        raise NotImplementedError

    # Global bounding box (Cartesian).
    xmin = min(img.coordinatesystem.domain["xmin"] for img in images)
    xmax = max(img.coordinatesystem.domain["xmax"] for img in images)
    ymin = min(img.coordinatesystem.domain["ymin"] for img in images)
    ymax = max(img.coordinatesystem.domain["ymax"] for img in images)

    # Finest voxel size.
    hy = min(img.voxel_size[0] for img in images)
    hx = min(img.voxel_size[1] for img in images)
    rows = int(np.ceil((ymax - ymin) / hy))
    cols = int(np.ceil((xmax - xmin) / hx))

    meta = images[0].metadata()
    meta["dimensions"] = [ymax - ymin, xmax - xmin]
    meta["origin"] = np.array([xmin, ymax])

    extra = images[0].shape[images[0].space_dim :]
    total = np.zeros((rows, cols, *extra), dtype=np.float32)
    for img in images:
        data = np.asarray(img.img, dtype=np.float32)
        cs = img.coordinatesystem
        # Embed: voxel (0,0) of img at global position.
        top_left = np.asarray(cs.coordinate([0, 0]))
        r0 = int(round((ymax - top_left[1]) / hy))
        c0 = int(round((top_left[0] - xmin) / hx))
        # Resample img onto the common voxel size if needed.
        target_shape = (
            int(round(img.dimensions[0] / hy)),
            int(round(img.dimensions[1] / hx)),
        )
        if data.shape[:2] != target_shape:
            import jax

            data = np.asarray(
                jax.image.resize(
                    jnp.asarray(data), target_shape + data.shape[2:], "linear"
                )
            )
        r1 = min(r0 + data.shape[0], rows)
        c1 = min(c0 + data.shape[1], cols)
        total[r0:r1, c0:c1] += data[: r1 - r0, : c1 - c0]

    return type(images[0])(img=total, **meta)


def stack(images: list) -> Image:
    """Stack single-time images into a space-time series."""
    assert all(img.shape == images[0].shape for img in images)
    data = np.stack(
        [np.asarray(img.img) for img in images], axis=images[0].space_dim
    )
    meta = images[0].metadata()
    meta["series"] = True
    meta["date"] = [img.date for img in images]
    times = [img.time for img in images]
    meta["time"] = times if not all(t is None for t in times) else None
    return type(images[0])(img=data, **meta)


def zeros_like(img: Image, mode: str = "image", dtype=None):
    """Zero image (mode="image") or zero spatial array (mode="voxels")."""
    shape = (
        img.shape
        if mode == "image"
        else tuple(img.num_voxels[: img.space_dim])
    )
    data = np.zeros(shape, dtype=dtype or np.float32)
    if mode == "voxels":
        meta = img.metadata()
        meta["scalar"] = True
        meta["series"] = False
        return Image(data, **meta)
    return type(img)(img=data, **img.metadata())


def ones_like(img: Image, mode: str = "image", dtype=None):
    """Unit image / spatial array, analogous to :func:`zeros_like`."""
    out = zeros_like(img, mode, dtype)
    out.img = jnp.ones_like(jnp.asarray(out.img))
    return out
