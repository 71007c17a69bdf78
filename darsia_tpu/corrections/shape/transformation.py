"""Geometric point transformations + transformation-based image correction.

Parity: reference ``src/darsia/corrections/shape/transformation.py:13-275``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Union

import jax.numpy as jnp
import numpy as np

from ...utils.point import (
    Coordinate,
    CoordinateArray,
    Voxel,
    VoxelArray,
    VoxelCenter,
    VoxelCenterArray,
    make_voxel,
    make_voxel_center,
)
from ..base import BaseCorrection

__all__ = ["BaseTransformation", "TransformationCorrection"]

_ARRAY_TYPE = {
    Coordinate: CoordinateArray,
    Voxel: VoxelArray,
    VoxelCenter: VoxelCenterArray,
    np.ndarray: np.ndarray,
}


class BaseTransformation(ABC):
    """Invertible point map with typed input/output point flavours."""

    def __init__(self) -> None:
        self.input_dtype = np.ndarray
        self.output_dtype = np.ndarray
        self.input_array_dtype = np.ndarray
        self.output_array_dtype = np.ndarray

    def set_dtype(self, pts_src, pts_dst) -> None:
        assert pts_src.shape == pts_dst.shape, "source and target points must match"
        self.input_dtype = type(pts_src[0])
        self.output_dtype = type(pts_dst[0])
        try:
            self.input_array_dtype = _ARRAY_TYPE[self.input_dtype]
            self.output_array_dtype = _ARRAY_TYPE[self.output_dtype]
        except KeyError as exc:
            raise ValueError("point type not supported") from exc

    @abstractmethod
    def set_parameters_as_vector(self, parameters: np.ndarray) -> None:
        ...

    @abstractmethod
    def fit(self, pts_src, pts_dst, **kwargs) -> None:
        ...

    @abstractmethod
    def call_array(self, x: np.ndarray) -> np.ndarray:
        ...

    @abstractmethod
    def inverse_array(self, x: np.ndarray) -> np.ndarray:
        ...

    def __call__(self, x):
        x_arr = np.atleast_2d(np.asarray(x))
        array_input = x_arr.shape == np.asarray(x).shape
        out_arr = self.call_array(x_arr)
        if array_input:
            return _wrap(out_arr, self.output_array_dtype)
        return _wrap(out_arr[0], self.output_dtype)

    def inverse(self, x):
        x_arr = np.atleast_2d(np.asarray(x))
        array_input = x_arr.shape == np.asarray(x).shape
        out_arr = self.inverse_array(x_arr)
        if array_input:
            return _wrap(out_arr, self.input_array_dtype)
        return _wrap(out_arr[0], self.input_dtype)


def _wrap(arr: np.ndarray, cls):
    if cls in (np.ndarray,):
        return arr
    if cls in (Voxel, VoxelArray):
        return make_voxel(arr)
    if cls in (VoxelCenter, VoxelCenterArray):
        return make_voxel_center(arr)
    return np.asarray(arr, dtype=float).view(cls)


class TransformationCorrection(BaseCorrection):
    """Warp an image from a source to a destination coordinate system by an
    invertible point transformation (nearest-voxel assignment)."""

    def __init__(
        self,
        coordinatesystem_src,
        coordinatesystem_dst,
        transformation: BaseTransformation,
    ) -> None:
        self.coordinatesystem_src = coordinatesystem_src
        self.coordinatesystem_dst = coordinatesystem_dst
        self.transformation = transformation
        self._cache: dict = {}

    def correct_array(self, array_src: jnp.ndarray) -> jnp.ndarray:
        dim = self.coordinatesystem_src.dim

        if "coords" not in self._cache:
            voxels_dst = self.coordinatesystem_dst.voxels
            # 1. Transformation input: voxel centers (or converted flavour).
            transformation_input = make_voxel_center(np.asarray(voxels_dst)).to(
                self.transformation.input_dtype, self.coordinatesystem_dst
            )
            # 2. Inverse map.
            transformation_output = self.transformation.inverse(
                transformation_input
            )
            # 3. Back to source voxels (continuous, for the warp kernel).
            if isinstance(transformation_output, (Coordinate, CoordinateArray)):
                voxels_src = np.asarray(
                    self.coordinatesystem_src.voxel(transformation_output),
                    dtype=float,
                )
            else:
                voxels_src = np.asarray(transformation_output, dtype=float)

            dst_shape = self.coordinatesystem_dst.shape
            coords = np.moveaxis(
                voxels_src.reshape((*dst_shape, dim), order="F"), -1, 0
            )
            self._cache["coords"] = jnp.asarray(coords, dtype=jnp.float32)

        from ...ops.warp import warp

        coords = self._cache["coords"]
        dtype = array_src.dtype
        out = warp(
            jnp.asarray(array_src).astype(jnp.float32), coords, order=0
        )
        if jnp.issubdtype(dtype, jnp.integer):
            out = jnp.round(out)
        return out.astype(dtype)

    def save(self, path) -> None:  # pragma: no cover - parity stub
        raise NotImplementedError("Not implemented yet.")

    def load(self, path) -> None:  # pragma: no cover - parity stub
        raise NotImplementedError("Not implemented yet.")
