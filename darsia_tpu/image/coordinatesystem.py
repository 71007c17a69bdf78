"""Voxel <-> Cartesian coordinate maps for physical images.

The coordinate map is affine per axis: ``coord = origin +/- voxel * h``.  On
the host it is exposed through :class:`CoordinateSystem` (API parity with
reference ``src/darsia/image/coordinatesystem.py:12-275``); for device code
the same map is available as jit-friendly pure functions
(:func:`voxels_to_coordinates` / :func:`coordinates_to_voxels`) operating on
stacked arrays — these are what warp kernels consume.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Union

import jax.numpy as jnp
import numpy as np

from ..utils.point import (
    Coordinate,
    CoordinateArray,
    Voxel,
    VoxelArray,
    make_coordinate,
    make_voxel,
)
from .indexing import interpret_indexing

if TYPE_CHECKING:  # pragma: no cover
    from .image import Image

__all__ = [
    "CoordinateSystem",
    "voxels_to_coordinates",
    "coordinates_to_voxels",
    "check_equal_coordinatesystems",
]


def check_equal_coordinatesystems(
    cs1: "CoordinateSystem", cs2: "CoordinateSystem", exclude_size: bool = False
) -> tuple[bool, list[str]]:
    """Compare two coordinate systems; returns (equal, failure log).

    Parity: reference ``image/coordinatesystem.py`` equality check.
    """
    log = []
    if cs1.dim != cs2.dim:
        log.append("dimension mismatch")
    if cs1.indexing != cs2.indexing:
        log.append("indexing mismatch")
    if not np.allclose(cs1.dimensions, cs2.dimensions):
        log.append("dimensions mismatch")
    if not np.allclose(
        np.asarray(cs1._coordinate_of_origin_voxel),
        np.asarray(cs2._coordinate_of_origin_voxel),
    ):
        log.append("origin mismatch")
    if not exclude_size and cs1.shape != cs2.shape:
        log.append("shape mismatch")
    return len(log) == 0, log


class CoordinateSystem:
    """Coordinate system of a physical image.

    Knows the conversion between voxels (matrix "ij"/"ijk" indexing, (0, 0)
    top-left) and Cartesian coordinates.
    """

    def __init__(self, img: "Image") -> None:
        assert img.indexing in ["i", "ij", "ijk"], "Indexing not supported."
        self.indexing = img.indexing
        self.dim = img.space_dim
        self.shape = tuple(img.img.shape[: self.dim])
        self.dimensions = list(img.dimensions)
        self.axes = "xyz"[: self.dim]

        self.voxel_size: dict[str, float] = {}
        for axis in self.axes:
            pos, _ = interpret_indexing(axis, self.indexing)
            self.voxel_size[axis] = img.voxel_size[pos]

        self._coordinate_of_origin_voxel: Coordinate = img.origin
        opposite_corner_voxel = list(self.shape)
        self._coordinate_of_opposite_voxel = self.coordinate(opposite_corner_voxel)

        corners = np.vstack(
            (
                np.asarray(self._coordinate_of_origin_voxel),
                np.asarray(self._coordinate_of_opposite_voxel),
            )
        )
        self.domain: dict[str, float] = {}
        for i, axis in enumerate(self.axes):
            self.domain[axis + "min"] = float(np.min(corners[:, i]))
            self.domain[axis + "max"] = float(np.max(corners[:, i]))
        self.max_coordinate = np.max(corners, axis=0)
        self.min_coordinate = np.min(corners, axis=0)

    # ------------------------------------------------------------------ api

    @property
    def voxels(self) -> VoxelArray:
        """All voxels of the image (column-major / Fortran order)."""
        if not hasattr(self, "_voxels"):
            self._voxels = make_voxel(
                np.indices(self.shape, dtype=int)
                .reshape((self.dim, -1), order="F")
                .T
            )
        return self._voxels

    @property
    def coordinates(self) -> CoordinateArray:
        """Cartesian coordinates of all voxels."""
        if not hasattr(self, "_coordinates"):
            self._coordinates = self.coordinate(self.voxels)
        return self._coordinates

    def length(self, num, axis: str):
        """Convert a voxel count along ``axis`` to metric length."""
        assert axis in self.axes
        return num * self.voxel_size[axis]

    def num_voxels(self, length, axis: str):
        """Convert metric length along ``axis`` to a voxel count (ceil)."""
        assert axis in self.axes
        return np.ceil(length / self.voxel_size[axis]).astype(int)

    def coordinate(self, voxel) -> Union[Coordinate, CoordinateArray]:
        """Voxel (matrix indexing) -> Cartesian coordinate."""
        if isinstance(voxel, (tuple, list)):
            voxel = np.array(voxel)
        voxel_array = np.atleast_2d(np.asarray(voxel))
        coordinate = np.empty(voxel_array.shape, dtype=float)
        origin = np.asarray(self._coordinate_of_origin_voxel, dtype=float)
        for i, axis in enumerate(self.axes):
            pos, revert = interpret_indexing(axis, self.indexing)
            scaling = -1.0 if revert else 1.0
            coordinate[:, i] = (
                origin[i] + scaling * voxel_array[:, pos] * self.voxel_size[axis]
            )
        return make_coordinate(coordinate.reshape(np.asarray(voxel).shape))

    def voxel(self, coordinate) -> Union[Voxel, VoxelArray]:
        """Cartesian coordinate -> voxel (matrix indexing, floor)."""
        if isinstance(coordinate, (tuple, list)):
            coordinate = np.array(coordinate)
        coordinate_array = np.atleast_2d(np.asarray(coordinate, dtype=float))
        voxel = np.empty(coordinate_array.shape, dtype=int)
        origin = np.asarray(self._coordinate_of_origin_voxel, dtype=float)
        for i, axis in enumerate(self.axes):
            pos, revert = interpret_indexing(axis, self.indexing)
            scaling = -1.0 if revert else 1.0
            voxel[:, pos] = np.floor(
                scaling * (coordinate_array[:, i] - origin[i]) / self.voxel_size[axis]
            )
        return make_voxel(voxel.reshape(np.asarray(coordinate).shape))

    def coordinate_vector(self, voxel_vector: np.ndarray) -> np.ndarray:
        """Convert relative voxel displacement vectors to Cartesian vectors."""
        vectors = np.atleast_2d(np.asarray(voxel_vector, dtype=float))
        out = np.empty(vectors.shape, dtype=float)
        for i, axis in enumerate(self.axes):
            pos, revert = interpret_indexing(axis, self.indexing)
            scaling = -1.0 if revert else 1.0
            out[:, i] = scaling * vectors[:, pos] * self.voxel_size[axis]
        return out.reshape(np.asarray(voxel_vector).shape)

    def voxel_vector(self, coordinate_vector: np.ndarray) -> np.ndarray:
        """Convert Cartesian vectors to voxel displacement vectors."""
        vectors = np.atleast_2d(np.asarray(coordinate_vector, dtype=float))
        out = np.empty(vectors.shape, dtype=float)
        for i, axis in enumerate(self.axes):
            pos, revert = interpret_indexing(axis, self.indexing)
            scaling = -1.0 if revert else 1.0
            out[:, pos] = scaling * vectors[:, i] / self.voxel_size[axis]
        return out.reshape(np.asarray(coordinate_vector).shape)

    def pixel_vector(self, coordinate_vector: np.ndarray) -> np.ndarray:
        """Alias of :meth:`voxel_vector` (the reference declares this seam
        unimplemented, coordinatesystem.py:267-272; here it works)."""
        return self.voxel_vector(coordinate_vector)

    def __eq__(self, other) -> bool:
        if not isinstance(other, CoordinateSystem):
            return NotImplemented
        return (
            self.indexing == other.indexing
            and self.shape == other.shape
            and np.allclose(self.dimensions, other.dimensions)
            and np.allclose(
                np.asarray(self._coordinate_of_origin_voxel),
                np.asarray(other._coordinate_of_origin_voxel),
            )
        )


# ---------------------------------------------------------------------------
# Jit-friendly functional forms (device-side).
# ---------------------------------------------------------------------------


def _axis_tables(indexing: str, dim: int):
    """Per-Cartesian-axis (position, sign) tables as arrays."""
    pos = []
    sign = []
    for axis in "xyz"[:dim]:
        p, revert = interpret_indexing(axis, indexing)
        pos.append(p)
        sign.append(-1.0 if revert else 1.0)
    return np.array(pos), np.array(sign)


def voxels_to_coordinates(
    voxels: jnp.ndarray,
    origin: jnp.ndarray,
    voxel_size: jnp.ndarray,
    indexing: str = "ij",
) -> jnp.ndarray:
    """Vectorised voxel -> coordinate map (device, differentiable).

    Args:
        voxels: (..., dim) voxel positions (matrix indexing order).
        origin: (dim,) Cartesian origin coordinate.
        voxel_size: (dim,) voxel size per *Cartesian axis* order (x, y, z).
        indexing: matrix indexing scheme.

    Returns:
        (..., dim) Cartesian coordinates.

    """
    dim = voxels.shape[-1]
    pos, sign = _axis_tables(indexing, dim)
    gathered = voxels[..., pos]
    return origin + jnp.asarray(sign) * gathered * voxel_size


def coordinates_to_voxels(
    coords: jnp.ndarray,
    origin: jnp.ndarray,
    voxel_size: jnp.ndarray,
    indexing: str = "ij",
    continuous: bool = False,
) -> jnp.ndarray:
    """Vectorised coordinate -> voxel map (device, differentiable).

    Args:
        coords: (..., dim) Cartesian coordinates.
        origin: (dim,) Cartesian origin coordinate.
        voxel_size: (dim,) per Cartesian axis.
        indexing: matrix indexing scheme.
        continuous: if True return fractional voxels (for interpolation);
            else floor to int.

    Returns:
        (..., dim) voxels in matrix indexing order.

    """
    dim = coords.shape[-1]
    pos, sign = _axis_tables(indexing, dim)
    frac_cart = jnp.asarray(sign) * (coords - origin) / voxel_size
    # Scatter Cartesian-axis values back into matrix-axis order.
    inv = np.empty(dim, dtype=int)
    inv[pos] = np.arange(dim)
    frac = frac_cart[..., inv]
    if continuous:
        return frac
    return jnp.floor(frac).astype(jnp.int32)
