"""Dimension reduction / extrusion of physical images.

Parity: reference ``src/darsia/signals/reduction/dimensionreduction.py:12-191``.
Data reduction runs as a jitted XLA reduction over the chosen axis; metadata
bookkeeping (dropping a Cartesian axis, recomputing the origin) is host-side.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from ...image.indexing import interpret_indexing

__all__ = ["AxisReduction", "reduce_axis", "extrude_along_axis"]


class AxisReduction:
    """Reduce a spatial axis of an image (average / sum / slice)."""

    def __init__(
        self, axis: Union[str, int], dim: int = 3, mode: str = "average", **kwargs
    ) -> None:
        if isinstance(axis, str):
            assert axis in "xyz"[:dim]
            index, _ = interpret_indexing(axis, "ijk"[:dim])
        else:
            assert axis in range(dim)
            index = axis
            index_alpha = "ijk"[:dim][index]
            cartesian_index, _ = interpret_indexing(index_alpha, "xyz"[:dim])
            axis = "xyz"[cartesian_index]

        self.index: int = index
        self.axis: int = "xyz".find(axis)
        self.mode: str = mode
        self.kwargs = kwargs

    def __call__(self, img):
        original_dim = img.space_dim
        original_axes = "xyz"[:original_dim]
        original_indexing = img.indexing
        if original_indexing != "ijk"[:original_dim]:
            raise NotImplementedError("Standard matrix indexing required.")

        new_dim = original_dim - 1
        new_axes = "xyz"[:new_dim]
        new_indexing = "ijk"[:new_dim]
        interim_indexing = original_indexing.replace(
            original_indexing[self.index], ""
        )

        if self.mode in ("average", "sum"):
            data = jnp.sum(jnp.asarray(img.img, dtype=jnp.float32), axis=self.index)
            if self.mode == "average":
                data = data / img.img.shape[self.index]
        elif self.mode == "slice":
            data = jnp.moveaxis(jnp.asarray(img.img), self.index, 0)[
                self.kwargs["slice_idx"]
            ]
        else:
            raise ValueError(f"Mode {self.mode} not supported.")

        new_dimensions = list(img.dimensions)
        new_dimensions.pop(self.index)

        # Cartesian min corner of the original domain.
        min_corner = np.asarray(img.origin, dtype=float).copy()
        for index, matrix_index in enumerate(original_indexing):
            axis_pos, reverse_axis = interpret_indexing(matrix_index, original_axes)
            if reverse_axis:
                min_corner[axis_pos] -= img.dimensions[index]

        new_min_corner = min_corner.tolist()
        new_min_corner.pop(self.axis)

        new_origin = np.array(new_min_corner)
        for new_index, _ in enumerate(interim_indexing):
            new_matrix_index = new_indexing[new_index]
            new_cartesian_index, revert_axis = interpret_indexing(
                new_matrix_index, new_axes
            )
            if revert_axis:
                new_origin[new_cartesian_index] += new_dimensions[new_index]

        metadata = img.metadata()
        metadata["space_dim"] = new_dim
        metadata["indexing"] = new_indexing
        metadata["origin"] = new_origin
        metadata["dimensions"] = new_dimensions
        return type(img)(img=data, **metadata)


def reduce_axis(image, axis: Union[str, int], mode: str = "average", **kwargs):
    """Reduce one spatial axis of ``image`` (wrapper around AxisReduction)."""
    reduction = AxisReduction(axis, image.space_dim, mode, **kwargs)
    return reduction(image)


def extrude_along_axis(img, height: float, num: int):
    """Extrude a 2d image into 3d along the z axis."""
    arr = jnp.asarray(img.img)
    arr_3d = jnp.broadcast_to(arr[None], (num, *arr.shape))
    meta = img.metadata()
    assert meta["space_dim"] == 2
    meta["space_dim"] = 3
    meta["dimensions"] = [height, *meta["dimensions"]]
    meta["indexing"] = "ijk"
    meta["origin"] = np.array([height, *np.asarray(meta["origin"])])
    return type(img)(img=arr_3d, **meta)
