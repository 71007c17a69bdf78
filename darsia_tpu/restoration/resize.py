"""Resize of physical images (cv2.resize-free).

Parity: reference ``src/darsia/restoration/resize.py:18-370``.  Resampling
runs as XLA programs (:mod:`darsia_tpu.ops.resize`): exact block means for
integer-factor shrinks, `jax.image.resize` otherwise, with optional
integral-preserving ("conservative") rescaling for extensive quantities.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_array

__all__ = ["Resize", "resize", "equalize_voxel_size", "uniform_refinement"]


class Resize:
    """Resize operator for 2d images/arrays.

    Args:
        ref_image: image whose voxel shape is the target.
        shape: target shape (matrix indexing).
        fx / fy: resize factors per Cartesian x / y.
        interpolation: "inter_area" | "inter_linear" | "inter_nearest".
        dtype: optional dtype conversion before resizing.
        key: kwargs prefix (e.g. "restoration ") for config-driven setup.

    """

    def __init__(
        self,
        ref_image=None,
        shape: Optional[tuple] = None,
        fx: Optional[float] = None,
        fy: Optional[float] = None,
        interpolation: Optional[str] = None,
        dtype=None,
        key: str = "",
        **kwargs,
    ) -> None:
        self.shape = kwargs.get(key + "resize shape", None) if shape is None else shape
        general_f = kwargs.get(key + "resize", None)
        self.fx = kwargs.get(key + "resize x", general_f) if fx is None else fx
        self.fy = kwargs.get(key + "resize y", general_f) if fy is None else fy
        self.dtype = kwargs.get(key + "resize dtype", None) if dtype is None else dtype

        if ref_image is not None:
            assert self.shape is None, "Provide only ref_image or shape."
            self.shape = tuple(ref_image.num_voxels)

        if self.shape is None:
            self.fx = 1 if self.fx is None else self.fx
            self.fy = 1 if self.fy is None else self.fy

        self.interpolation = (
            kwargs.get(key + "resize interpolation", None)
            if interpolation is None
            else interpolation
        )
        if self.interpolation is not None and self.interpolation not in (
            "inter_area",
            "inter_linear",
            "inter_nearest",
        ):
            raise NotImplementedError(
                f"Interpolation option {self.interpolation} is not implemented."
            )

        conservative_key = key + "resize conservative"
        self._conservative_explicit = conservative_key in kwargs
        self.is_conservative = kwargs.get(conservative_key, False)

    def __str__(self) -> str:
        return "resize"

    def _target_shape(self, current: tuple[int, int]) -> tuple[int, int]:
        if self.shape is not None:
            return tuple(self.shape[:2])
        return (
            max(int(round(current[0] * self.fy)), 1),
            max(int(round(current[1] * self.fx)), 1),
        )

    def __call__(self, img, overwrite: bool = False):
        """Resize an array or Image (returning matching type)."""
        is_image = hasattr(img, "img")
        arr = jnp.asarray(img.img if is_image else img)

        if self.dtype is not None:
            from ..utils.dtype import convert_dtype

            arr = convert_dtype(arr, self.dtype)

        interpolation = self.interpolation or "inter_area"
        target = self._target_shape(tuple(arr.shape[:2]))
        resized = resize_array(
            arr,
            target,
            interpolation=interpolation,
            conservative=self.is_conservative,
        )
        if not self.is_conservative and jnp.issubdtype(arr.dtype, jnp.integer):
            resized = jnp.round(resized).astype(arr.dtype)

        if not is_image:
            return resized

        metadata = img.metadata()
        if overwrite:
            img.img = resized
            return img
        return type(img)(img=resized, **metadata)

    def save(self, path) -> None:
        from pathlib import Path

        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            class_name="Resize",
            state=np.array(
                [
                    {
                        "shape": self.shape,
                        "fx": self.fx,
                        "fy": self.fy,
                        "interpolation": self.interpolation,
                        "is_conservative": self.is_conservative,
                    }
                ],
                dtype=object,
            ),
        )

    def load(self, path) -> None:
        data = np.load(path, allow_pickle=True)["state"][0]
        self.shape = data["shape"]
        self.fx = data["fx"]
        self.fy = data["fy"]
        self.interpolation = data["interpolation"]
        self.is_conservative = data["is_conservative"]


def resize(image, **kwargs):
    """Functional resize of an Image (kwargs as in :class:`Resize`)."""
    return Resize(**kwargs)(image)


def equalize_voxel_size(image, voxel_size: Optional[float] = None, **kwargs):
    """Resize so all voxels become squares of size ``voxel_size``."""
    if voxel_size is None:
        voxel_size = min(image.voxel_size)
    shape = tuple(
        int(round(image.dimensions[i] / voxel_size)) for i in range(2)
    )
    resizer = Resize(
        shape=shape, interpolation=kwargs.get("interpolation", "inter_linear")
    )
    return resizer(image)


def uniform_refinement(image, levels: int):
    """Refine (levels > 0) or coarsen (levels < 0) by powers of two."""
    factor = 2.0**levels
    shape = tuple(max(int(round(n * factor)), 1) for n in image.num_voxels[:2])
    interp = "inter_linear" if levels >= 0 else "inter_area"
    return Resize(shape=shape, interpolation=interp)(image)
