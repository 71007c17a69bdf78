"""Geometric integration over (weighted/extruded/porous) geometries.

Parity: reference ``src/darsia/measure/integration.py:18-452``.  Integration
is a weighted reduction (device-friendly); conservative reshaping of the
voxel-volume field uses our sum-preserving resize instead of cv2.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from ..image.image import ExtensiveImage, Image
from ..ops.resize import resize_array

__all__ = [
    "Geometry",
    "WeightedGeometry",
    "ExtrudedGeometry",
    "PorousGeometry",
    "ExtrudedPorousGeometry",
]


class Geometry:
    """Geometry of a voxelized domain with integration capabilities."""

    def __init__(
        self,
        space_dim: int,
        num_voxels,
        dimensions: Optional[list] = None,
        voxel_size: Optional[list] = None,
        **kwargs,
    ) -> None:
        self.space_dim = space_dim
        self.num_voxels = list(num_voxels[:space_dim])
        if dimensions is None:
            assert voxel_size is not None
            self.voxel_size = list(voxel_size)
            self.dimensions = [
                self.num_voxels[i] * self.voxel_size[i]
                for i in range(self.space_dim)
            ]
        else:
            self.dimensions = list(dimensions)
            self.voxel_size = [
                self.dimensions[i] / self.num_voxels[i]
                for i in range(self.space_dim)
            ]
        self.voxel_volume = np.prod(self.voxel_size)
        self.cached_voxel_volume = (
            self.voxel_volume.copy()
            if isinstance(self.voxel_volume, np.ndarray)
            else self.voxel_volume
        )

    def _prepare_cached_voxel_volume(self, fetched_shape: list) -> None:
        scaling = float(np.prod(np.divide(self.num_voxels, fetched_shape)))
        if isinstance(self.voxel_volume, np.ndarray):
            cached_shape = list(np.shape(self.cached_voxel_volume))
            if not all(i == j for i, j in zip(fetched_shape, cached_shape)):
                if self.space_dim != 2:
                    raise ValueError("Reshaping only supported in 2d.")
                self.cached_voxel_volume = (
                    np.asarray(
                        resize_array(
                            jnp.asarray(self.voxel_volume, dtype=jnp.float32),
                            tuple(fetched_shape[:2]),
                            "inter_area",
                        )
                    )
                    * scaling
                )
        else:
            if all(i == j for i, j in zip(fetched_shape, self.num_voxels)):
                self.cached_voxel_volume = self.voxel_volume
            else:
                if self.space_dim != 2:
                    raise ValueError("Reshaping only supported in 2d.")
                self.cached_voxel_volume = self.voxel_volume * scaling

    def integrate(self, data) -> Union[float, np.ndarray]:
        """Integrate data over the geometry (weighted sum reduction)."""
        fetched = np.asarray(data.img if hasattr(data, "img") else data)
        fetched_shape = list(fetched.shape[: self.space_dim])
        if isinstance(data, ExtensiveImage):
            total = fetched
            for _ in range(self.space_dim):
                total = np.sum(total, axis=0)
            return total
        self._prepare_cached_voxel_volume(fetched_shape)
        volume = self.cached_voxel_volume
        if isinstance(volume, np.ndarray) and fetched.ndim > self.space_dim:
            volume = volume.reshape(
                volume.shape + (1,) * (fetched.ndim - self.space_dim)
            )
        weighted = np.multiply(volume, fetched)
        for _ in range(self.space_dim):
            weighted = np.sum(weighted, axis=0)
        return weighted

    def make_extensive(self, data: Image) -> ExtensiveImage:
        """Convert intensive data to per-voxel integrated (extensive) data."""
        fetched = np.asarray(data.img)
        self._prepare_cached_voxel_volume(list(fetched.shape[: self.space_dim]))
        volume = self.cached_voxel_volume
        if isinstance(volume, np.ndarray) and fetched.ndim > self.space_dim:
            volume = volume.reshape(
                volume.shape + (1,) * (fetched.ndim - self.space_dim)
            )
        return ExtensiveImage(np.multiply(volume, fetched), **data.metadata())

    def normalize(self, img: Image, img_ref: Image, return_ratio: bool = False):
        """Rescale img so its integral matches img_ref's."""
        integral_ref = self.integrate(img_ref)
        integral = self.integrate(img)
        ratio = np.divide(integral_ref, integral)
        rescaled = img.copy()
        rescaled.img = jnp.asarray(img.img) * jnp.asarray(ratio)
        if return_ratio:
            return rescaled, ratio
        return rescaled

    def subregion(self, roi) -> "Geometry":
        roi = np.asarray(roi)
        new_dimensions = []
        new_num_voxels = []
        for i in range(self.space_dim):
            length = float(np.max(roi, axis=0)[i] - np.min(roi, axis=0)[i])
            new_dimensions.append(length)
            new_num_voxels.append(int(np.ceil(length / self.voxel_size[i])))
        return Geometry(self.space_dim, new_num_voxels, new_dimensions)


class WeightedGeometry(Geometry):
    """Geometry with a (possibly heterogeneous) volume weight."""

    def __init__(
        self,
        weight,
        space_dim: int,
        num_voxels,
        dimensions: Optional[list] = None,
        voxel_size: Optional[list] = None,
        **kwargs,
    ) -> None:
        super().__init__(space_dim, num_voxels, dimensions, voxel_size)
        if isinstance(weight, np.ndarray) and weight.ndim != self.space_dim:
            raise ValueError(
                "Weight must have the same number of dimensions as the geometry."
            )
        self.weight = (
            np.nan_to_num(np.array(weight, copy=True), nan=0.0)
            if isinstance(weight, np.ndarray)
            else weight
        )
        self.voxel_volume = np.multiply(self.voxel_volume, self.weight)
        self.cached_voxel_volume = (
            self.voxel_volume.copy()
            if isinstance(self.voxel_volume, np.ndarray)
            else self.voxel_volume
        )

    def subregion(self, roi) -> "WeightedGeometry":
        sub = super(WeightedGeometry, self).subregion(roi)
        if isinstance(self.weight, np.ndarray):
            weight_image = Image(
                self.weight, dimensions=self.dimensions, space_dim=self.space_dim,
                scalar=True,
            )
            sub_weight = np.asarray(weight_image.subregion(roi).img)
        else:
            sub_weight = self.weight
        num_voxels = (
            list(np.shape(sub_weight))
            if isinstance(sub_weight, np.ndarray)
            else sub.num_voxels
        )
        return WeightedGeometry(
            sub_weight, sub.space_dim, num_voxels, sub.dimensions, sub.voxel_size
        )


class ExtrudedGeometry(WeightedGeometry):
    """2d geometry extruded by an effective depth (map)."""

    def __init__(self, expansion, space_dim, num_voxels, dimensions=None, voxel_size=None, **kwargs):
        expansion = (
            np.asarray(expansion.img) if hasattr(expansion, "img") else expansion
        )
        self.depth = expansion
        super().__init__(expansion, space_dim, num_voxels, dimensions, voxel_size)


class PorousGeometry(WeightedGeometry):
    """Geometry weighted by porosity."""

    def __init__(self, porosity, space_dim, num_voxels, dimensions=None, voxel_size=None, **kwargs):
        porosity_arr = (
            np.asarray(porosity.img) if hasattr(porosity, "img") else porosity
        )
        self.porosity = porosity
        super().__init__(porosity_arr, space_dim, num_voxels, dimensions, voxel_size)


class ExtrudedPorousGeometry(WeightedGeometry):
    """Geometry weighted by porosity * depth."""

    def __init__(
        self, porosity, depth, space_dim, num_voxels, dimensions=None, voxel_size=None, **kwargs
    ):
        self.porosity = porosity
        self.depth = depth
        porosity_arr = (
            np.asarray(porosity.img) if hasattr(porosity, "img") else porosity
        )
        depth_arr = np.asarray(depth.img) if hasattr(depth, "img") else depth
        integrated = np.multiply(porosity_arr, depth_arr)
        super().__init__(integrated, space_dim, num_voxels, dimensions, voxel_size)

    def update(self, depth) -> None:
        """Update the effective depth and recompute weighted volumes."""
        self.depth = depth
        porosity_arr = (
            np.asarray(self.porosity.img)
            if hasattr(self.porosity, "img")
            else self.porosity
        )
        depth_arr = np.asarray(depth.img) if hasattr(depth, "img") else depth
        integrated = np.multiply(porosity_arr, depth_arr)
        self.voxel_volume = np.multiply(
            np.divide(self.voxel_volume, self.weight), integrated
        )
        self.cached_voxel_volume = (
            self.voxel_volume.copy()
            if isinstance(self.voxel_volume, np.ndarray)
            else self.voxel_volume
        )
        self.weight = integrated
