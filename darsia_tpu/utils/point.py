"""Physical points: Cartesian coordinates vs. voxel indices.

Host-side metadata types (numpy subclasses).  Device compute never sees these;
they exist so user-facing APIs can distinguish "a position in meters" from "a
position in array indices" and convert between the two via a
:class:`~darsia_tpu.image.coordinatesystem.CoordinateSystem`.

API parity with reference ``src/darsia/utils/point.py:18-377``.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import numpy as np

__all__ = [
    "BasePoint",
    "Coordinate",
    "Voxel",
    "VoxelCenter",
    "CoordinateArray",
    "VoxelArray",
    "VoxelCenterArray",
    "make_coordinate",
    "make_voxel",
    "make_voxel_center",
    "to_coordinate",
    "to_voxel",
    "to_voxel_center",
]


class BasePoint(np.ndarray):
    """Base class for all physical point types (ndarray view subclass)."""

    def __new__(cls, input_array=None):
        if input_array is None:
            input_array = np.empty(0)
        return np.asarray(input_array).view(cls)

    def __array_finalize__(self, obj):
        pass

    def to(self, cls, coordinatesystem=None):
        """Convert this point to another point type.

        Args:
            cls: target class (Coordinate, Voxel, VoxelCenter or array types).
            coordinatesystem: required when switching between physical and
                voxel space.

        """
        return _convert_point(self, cls, coordinatesystem)


class Coordinate(BasePoint):
    """Cartesian coordinate (xyz-ordering), float-valued."""

    def __new__(cls, input_array=None):
        if input_array is None:
            input_array = np.empty(0)
        return np.asarray(input_array, dtype=float).view(cls)


class Voxel(BasePoint):
    """Voxel index (matrix ijk-ordering), int-valued.

    Args:
        input_array: raw index data.
        matrix_indexing: if False, input is given in Cartesian (xy) ordering
            and the leading two components are swapped into matrix ordering.

    """

    def __new__(cls, input_array, matrix_indexing: bool = True):
        arr = np.atleast_1d(np.asarray(input_array))
        arr = np.floor(arr.astype(float)).astype(int)
        if not matrix_indexing:
            arr = _swap_leading(arr)
        return arr.view(cls)


class VoxelCenter(BasePoint):
    """Center of a voxel: voxel index + 0.5 per axis (matrix ordering)."""

    def __new__(cls, input_array, matrix_indexing: bool = True):
        arr = np.atleast_1d(np.asarray(input_array, dtype=float))
        arr = np.floor(arr) + 0.5
        if not matrix_indexing:
            arr = _swap_leading(arr)
        return arr.view(cls)


class CoordinateArray(Coordinate):
    """2d array of coordinates — one coordinate per row."""

    def __getitem__(self, key: Any) -> Union[Coordinate, "CoordinateArray", np.ndarray]:
        item = np.asarray(self)[key]
        return _wrap_item(item, Coordinate, CoordinateArray)


class VoxelArray(Voxel):
    """2d array of voxels — one voxel per row."""

    def __new__(cls, input_array, matrix_indexing: bool = True):
        return Voxel.__new__(cls, input_array, matrix_indexing)

    def __getitem__(self, key: Any) -> Union[Voxel, "VoxelArray", np.ndarray]:
        item = np.asarray(self)[key]
        return _wrap_item(item, Voxel, VoxelArray)


class VoxelCenterArray(VoxelCenter):
    """2d array of voxel centers — one center per row."""

    def __new__(cls, input_array, matrix_indexing: bool = True):
        return VoxelCenter.__new__(cls, input_array, matrix_indexing)

    def __getitem__(self, key: Any) -> Union[VoxelCenter, "VoxelCenterArray", np.ndarray]:
        item = np.asarray(self)[key]
        return _wrap_item(item, VoxelCenter, VoxelCenterArray)


def _swap_leading(arr: np.ndarray) -> np.ndarray:
    """Swap the two leading spatial components (xy <-> ij reorder)."""
    arr = np.array(arr)
    if arr.ndim == 1:
        arr[[0, 1]] = arr[[1, 0]]
    else:
        arr[:, [0, 1]] = arr[:, [1, 0]]
    return arr


def _wrap_item(item: np.ndarray, single_cls, array_cls):
    item = np.asarray(item)
    if item.ndim == 1:
        return item.view(single_cls)
    if item.ndim == 2:
        return item.view(array_cls)
    return item


def make_coordinate(pts: Union[list, np.ndarray]) -> Union[Coordinate, CoordinateArray]:
    """Create a Coordinate (1d input) or CoordinateArray (2d input)."""
    arr = np.asarray(pts, dtype=float)
    if arr.ndim <= 1:
        return Coordinate(arr)
    return np.asarray(arr).view(CoordinateArray)


def make_voxel(
    pts: Union[list, np.ndarray], matrix_indexing: bool = True
) -> Union[Voxel, VoxelArray]:
    """Create a Voxel (1d input) or VoxelArray (2d input)."""
    arr = np.asarray(pts)
    if arr.ndim <= 1:
        return Voxel(arr, matrix_indexing)
    return VoxelArray(arr, matrix_indexing)


def make_voxel_center(
    pts: Union[list, np.ndarray], matrix_indexing: bool = True
) -> Union[VoxelCenter, VoxelCenterArray]:
    """Create a VoxelCenter (1d input) or VoxelCenterArray (2d input)."""
    arr = np.asarray(pts)
    if arr.ndim <= 1:
        return VoxelCenter(arr, matrix_indexing)
    return VoxelCenterArray(arr, matrix_indexing)


def _convert_point(point, cls, coordinatesystem=None):
    """Dispatch conversion between point flavours."""
    is_array = np.asarray(point).ndim == 2
    # Identity-flavour conversions
    if isinstance(point, Coordinate) and cls in (Coordinate, CoordinateArray):
        return point
    if isinstance(point, VoxelCenter) and cls in (VoxelCenter, VoxelCenterArray):
        return point
    # Note: VoxelCenter is a subclass check before Voxel since both derive
    # from BasePoint independently.
    if isinstance(point, Voxel) and not isinstance(point, VoxelCenter):
        if cls in (Voxel, VoxelArray):
            return point
        if cls in (VoxelCenter, VoxelCenterArray):
            return make_voxel_center(np.asarray(point))
        if cls in (Coordinate, CoordinateArray):
            # Voxel -> its corner coordinate (reference point.py:299-301
            # calls coordinatesystem.coordinate on the raw voxel index);
            # center semantics are available via VoxelCenter.
            assert coordinatesystem is not None
            return coordinatesystem.coordinate(point)
    if isinstance(point, VoxelCenter):
        if cls in (Voxel, VoxelArray):
            return make_voxel(np.floor(np.asarray(point)))
        if cls in (Coordinate, CoordinateArray):
            assert coordinatesystem is not None
            return coordinatesystem.coordinate(point)
    if isinstance(point, Coordinate):
        if cls in (Voxel, VoxelArray):
            assert coordinatesystem is not None
            return coordinatesystem.voxel(point)
        if cls in (VoxelCenter, VoxelCenterArray):
            assert coordinatesystem is not None
            return make_voxel_center(np.asarray(coordinatesystem.voxel(point)))
    raise TypeError(f"Cannot convert {type(point)} to {cls}")


def to_coordinate(point, coordinatesystem=None):
    """Convert any point flavour to Coordinate(s)."""
    pt = _as_point(point)
    return pt.to(Coordinate, coordinatesystem)


def to_voxel(point, coordinatesystem=None):
    """Convert any point flavour to Voxel(s)."""
    pt = _as_point(point)
    return pt.to(Voxel, coordinatesystem)


def to_voxel_center(point, coordinatesystem=None):
    """Convert any point flavour to VoxelCenter(s)."""
    pt = _as_point(point)
    return pt.to(VoxelCenter, coordinatesystem)


def _as_point(point):
    if isinstance(point, BasePoint):
        return point
    arr = np.asarray(point)
    if np.issubdtype(arr.dtype, np.integer):
        return make_voxel(arr)
    return make_coordinate(arr)


# Method-style conversion API (reference utils/point.py:374-376 attaches
# these as BasePoint methods): ``voxels.to_coordinate(cs)`` etc.
BasePoint.to_coordinate = lambda self, coordinatesystem=None: to_coordinate(
    self, coordinatesystem
)
BasePoint.to_voxel = lambda self, coordinatesystem=None: to_voxel(
    self, coordinatesystem
)
BasePoint.to_voxel_center = (
    lambda self, coordinatesystem=None: to_voxel_center(self, coordinatesystem)
)
