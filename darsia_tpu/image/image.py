"""Physical space-time images on TPU.

The central data structure of darsia_tpu: an :class:`Image` couples a device
array (JAX, living in HBM) with *physical* metadata — spatial dimensions in
meters, Cartesian origin, time axis — so that analysis pipelines can reason in
physical space while all pixel compute runs as fused XLA programs.

Design (TPU-first, not a port):

* ``Image.img`` is a ``jax.Array``; every transformation is a pure function
  on that array.  The class is registered as a JAX pytree (data leaf +
  hashable static metadata) so whole images can cross ``jit`` boundaries and
  pipelines fuse into single XLA programs.
* Corrections applied at construction (``transformations=[...]``) mirror the
  reference pipeline semantics (reference ``src/darsia/image/image.py:40-199``)
  but runs of geometric corrections collapse into a single fused warp via
  :func:`darsia_tpu.corrections.fuse.apply_transformation_chain`.

Behavioral parity: reference ``src/darsia/image/image.py:35-2384``.
"""

from __future__ import annotations

import logging
from datetime import datetime
from pathlib import Path
from typing import Any, Optional, Union
from warnings import warn

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dtype import convert_dtype
from ..utils.point import (
    Coordinate,
    CoordinateArray,
    Voxel,
    VoxelArray,
    make_coordinate,
)
from .coordinatesystem import CoordinateSystem
from .indexing import interpret_indexing, to_matrix_indexing

logger = logging.getLogger(__name__)

__all__ = ["Image", "ScalarImage", "OpticalImage", "ExtensiveImage"]


class Image:
    """Physical space-time image.

    Supports scalar- and vector-valued 2d/3d images, single time slices and
    time series.  Data layout: ``space axes + (time axis if series) +
    (range axes if not scalar)``, with matrix ("ij"/"ijk") spatial indexing.

    Args:
        img: data array (numpy or jax; promoted to a jax array).
        transformations: correction/reduction callables applied in order at
            construction (each maps Image -> Image in place).
        **kwargs: metadata — ``space_dim``, ``indexing``, ``dimensions`` (or
            ``width``/``height``/``depth``), ``origin``, ``series``,
            ``scalar``, ``date``, ``time``, ``name``.

    """

    def __init__(
        self,
        img,
        transformations: Optional[list] = None,
        **kwargs,
    ) -> None:
        # ---- data
        self.original_dtype = img.dtype
        self.img = img

        # ---- spatial metadata
        self.space_dim: int = int(kwargs.get("space_dim", kwargs.get("dim", 2)))
        self.indexing: str = kwargs.get("indexing", "ijk"[: self.space_dim])
        assert self.indexing == "ijk"[: self.space_dim], "matrix indexing only"

        dimensions = list(kwargs.get("dimensions", self.space_dim * [1.0]))
        if "height" in kwargs:
            dimensions[0] = kwargs.get("height")
        if "width" in kwargs:
            dimensions[1] = kwargs.get("width")
        if "depth" in kwargs and self.space_dim > 2:
            dimensions[2] = kwargs.get("depth")
        self.dimensions: list[float] = [float(d) for d in dimensions]

        self.name = kwargs.get("name", None)

        # Cartesian coordinate of voxel (0,...,0): defaults place the origin
        # so that reversed axes (y in 2d; y,z in 3d) span [0, dimension].
        default_origin = self.space_dim * [0.0]
        for index_counter, index in enumerate(self.indexing):
            axis_pos, reverse_axis = interpret_indexing(
                index, "xyz"[: self.space_dim]
            )
            if reverse_axis:
                default_origin[axis_pos] = self.dimensions[index_counter]
        self.origin = Coordinate(
            np.asarray(kwargs.pop("origin", default_origin), dtype=float)
        )

        # ---- temporal metadata
        self.series: bool = bool(kwargs.get("series", False))
        if self.series:
            self.time_dim = 1
            self.time_num = int(self.img.shape[self.space_dim])
        else:
            self.time_dim = 0
            self.time_num = 1

        default_date = self.time_num * [None] if self.series else None
        self.date = kwargs.get("date", default_date)
        default_reference_date = (
            self.date[0] if isinstance(self.date, list) else self.date
        )
        self.reference_date: Optional[datetime] = kwargs.pop(
            "reference_date", default_reference_date
        )
        self.time: Any = None
        self.set_time(kwargs.pop("time", None))

        if self.series and self._is_none(self.date) and self._is_none(self.time):
            warn("No time information provided for the image.")

        # ---- range metadata
        self.scalar: bool = bool(kwargs.get("scalar", False))
        if self.scalar:
            self.range_dim: int = 0
            self.range_num: int = 1
        else:
            self.range_dim = len(self.shape[self.space_dim + self.time_dim :])
            self.range_num = int(
                np.prod(self.shape[self.space_dim + self.time_dim :], dtype=int)
            )

        # ---- transformations pipeline (runs of geometric corrections fuse
        # into ONE warp — see darsia_tpu.corrections.fuse; reference applies
        # one resampling pass per correction, image/image.py:192-199)
        if transformations is not None:
            from ..corrections.fuse import apply_transformation_chain

            apply_transformation_chain(self, transformations)

        assert len(self.shape) == self.space_dim + self.time_dim + self.range_dim

    # ------------------------------------------------------------------ data

    @property
    def img(self):
        return self._img

    @img.setter
    def img(self, value) -> None:
        # Promote to a jax array unless it is an object/str array (metadata).
        if isinstance(value, np.ndarray) and value.dtype == object:
            self._img = value
        else:
            self._img = jnp.asarray(value)

    @property
    def shape(self) -> tuple:
        return tuple(self.img.shape)

    @property
    def dtype(self):
        return self.img.dtype

    @property
    def space_num(self) -> int:
        return int(np.prod(self.shape[: self.space_dim], dtype=int))

    @property
    def num_voxels(self) -> list[int]:
        return list(self.shape[: self.space_dim])

    @property
    def voxel_size(self) -> list[float]:
        return [
            self.dimensions[i] / self.num_voxels[i] for i in range(self.space_dim)
        ]

    @property
    def coordinatesystem(self) -> CoordinateSystem:
        return CoordinateSystem(self)

    @property
    def opposite_corner(self) -> Coordinate:
        return self.coordinatesystem.coordinate(list(self.shape[: self.space_dim]))

    @property
    def domain(self) -> tuple:
        if self.space_dim == 1:
            return (self.origin[0], self.opposite_corner[0])
        if self.space_dim == 2:
            return (
                self.origin[0],
                self.opposite_corner[0],
                self.opposite_corner[1],
                self.origin[1],
            )
        raise NotImplementedError

    def as_numpy(self) -> np.ndarray:
        """Host copy of the data array."""
        return np.asarray(self.img)

    # ------------------------------------------------------------------ time

    @staticmethod
    def _is_none(value) -> bool:
        if value is None:
            return True
        if isinstance(value, list):
            return all(v is None for v in value)
        return False

    def set_time(self, time=None) -> None:
        """Set relative time (seconds); derived from dates if not given."""
        if time is None:
            if self.series:
                if self._is_none(self.date) or self.reference_date is None:
                    self.time = self.time_num * [None]
                else:
                    self.time = [
                        (d - self.reference_date).total_seconds() for d in self.date
                    ]
            else:
                if self._is_none(self.date) or self.reference_date is None:
                    self.time = None
                else:
                    self.time = (self.date - self.reference_date).total_seconds()
        else:
            self.time = time

    def update_reference_time(self, reference) -> None:
        """Redefine the reference date/time, shifting relative times."""
        if isinstance(reference, datetime):
            self.reference_date = reference
            self.set_time()
        else:
            delta = float(reference)
            if self.series:
                self.time = [None if t is None else t - delta for t in self.time]
            elif self.time is not None:
                self.time = self.time - delta

    def reset_reference_time(self) -> None:
        """Pick the first slice's date as the reference date
        (reference image.py:350-362)."""
        if self._is_none(self.date):
            if isinstance(self.time, list) and self.time and self.time[0] is not None:
                base = self.time[0]
                self.time = [None if t is None else t - base for t in self.time]
        else:
            self.reference_date = (
                self.date[0] if isinstance(self.date, list) else self.date
            )
            self.set_time()

    def append(self, image: "Image", offset=None) -> None:
        """Append another image along the time axis, making this a series
        (reference image.py:372-440)."""
        if self.space_dim != image.space_dim or self.scalar != image.scalar:
            raise ValueError("Incompatible images for append.")
        if list(self.num_voxels) != list(image.num_voxels) or not np.allclose(
            np.asarray(self.dimensions, dtype=float),
            np.asarray(image.dimensions, dtype=float),
        ):
            raise ValueError("Incompatible voxel grids for append.")
        if not np.allclose(
            np.asarray(self.origin, dtype=float),
            np.asarray(image.origin, dtype=float),
        ):
            raise ValueError("Incompatible origins for append.")

        def time_slices(im: "Image") -> list:
            if im.series:
                axis = im.space_dim
                return [
                    jnp.take(jnp.asarray(im.img), k, axis=axis)
                    for k in range(im.time_num)
                ]
            return [jnp.asarray(im.img)]

        slices = time_slices(self) + time_slices(image)
        self.img = jnp.stack(slices, axis=self.space_dim)
        self.series = True
        # A series carries a time axis: keep the constructor invariant
        # len(shape) == space_dim + time_dim + range_dim intact (reference
        # image.py:372-440 sets time_dim = 1 on append).
        self.time_dim = 1

        # Dates concatenate; relative times shift by the given offset.
        dates = self.date if isinstance(self.date, list) else [self.date]
        dates = dates + (
            image.date if isinstance(image.date, list) else [image.date]
        )
        self.date = dates
        if self._is_none(self.time) or self._is_none(image.time) or offset is None:
            time = None
        else:
            time = self.time if isinstance(self.time, list) else [self.time]
            other = image.time if isinstance(image.time, list) else [image.time]
            time = time + [t + offset for t in other]
        self.time_num += image.time_num
        self.set_time(time)

    # -------------------------------------------------------------- metadata

    def metadata(self) -> dict:
        """Full metadata dictionary, sufficient to reconstruct the image."""
        return {
            "space_dim": self.space_dim,
            "indexing": self.indexing,
            "dimensions": list(self.dimensions),
            "origin": self.origin,
            "series": self.series,
            "scalar": self.scalar,
            "date": self.date,
            "reference_date": self.reference_date,
            "time": self.time,
            "name": self.name,
        }

    def shape_metadata(self) -> dict:
        return {
            "space_dim": self.space_dim,
            "indexing": self.indexing,
            "dimensions": list(self.dimensions),
            "origin": self.origin,
            "shape": self.shape,
            "num_voxels": self.num_voxels,
            "voxel_size": self.voxel_size,
        }

    def copy(self) -> "Image":
        """Copy (jax arrays are immutable; metadata deep-copied)."""
        return type(self)(img=self.img, **self.metadata())

    def astype(self, data_type) -> "Image":
        """Return copy with data cast (and rescaled) to ``data_type``.

        The conversion stays on device (``convert_dtype`` handles jax
        arrays) — routing through numpy would download+re-upload the full
        image per call, the dominant per-image cost on relayed backends.
        """
        copy_image = self.copy()
        copy_image.img = convert_dtype(self.img, data_type)
        return copy_image

    def img_as(self, data_type) -> "Image":
        return self.astype(data_type)

    def update_metadata(self, meta: Optional[dict] = None, **kwargs) -> None:
        """Overwrite metadata attributes in place
        (reference image.py:441-456)."""
        for key, value in {**(meta or {}), **kwargs}.items():
            setattr(self, key, value)

    def resize(self, cx: float, cy: Optional[float] = None) -> None:
        """Rescale the image in place by factors (cx, cy).

        The reference declares this seam and leaves it unimplemented
        (image.py:458); here it routes through the conservative device
        resize (restoration/resize.py).
        """
        from ..restoration.resize import resize as _resize

        cy = cx if cy is None else cy
        ny = max(int(round(self.num_voxels[0] * cy)), 1)
        nx = max(int(round(self.num_voxels[1] * cx)), 1)
        resized = _resize(self, shape=(ny, nx))
        self.img = resized.img

    def roi(self, roi) -> "Image":
        """Extract the spatial subregion of a :class:`~..roi.ROI`
        (reference image.py:856-866)."""
        return roi(self)

    def reset_origin(self, return_image: bool = False):
        """Zero the origin (respecting reversed axes); optionally return a
        copy carrying the OLD coordinate system (reference image.py:870-894)."""
        metadata = self.metadata()
        origin = self.space_dim * [0.0]
        for index_counter, index in enumerate(self.indexing):
            axis, reverse_axis = interpret_indexing(
                index, "xyz"[: self.space_dim]
            )
            if reverse_axis:
                origin[axis] = self.dimensions[index_counter]
        self.origin = Coordinate(np.asarray(origin, dtype=float))
        if return_image:
            return type(self)(img=self.img, **metadata)

    def geometry(self):
        """Flat :class:`~...measure.integration.Geometry` of this image
        (reference image.py:1836-1843)."""
        from ..measure.integration import Geometry

        return Geometry(**self.shape_metadata())

    def integral(self) -> float:
        """Integrate a scalar single image over space
        (reference image.py:1845-1856)."""
        if not self.scalar:
            raise NotImplementedError(
                "Integration only implemented for scalar images."
            )
        if self.series:
            raise NotImplementedError(
                "Integration only implemented for single images."
            )
        return float(self.geometry().integrate(self))

    # --------------------------------------------------------------- slicing

    def time_slice(self, time_index: int) -> "Image":
        """Extract a single time slice from a series."""
        if not self.series:
            raise ValueError("Image is not a time-series.")
        if self.scalar:
            img = self.img[..., time_index]
        else:
            img = self.img[..., time_index, :]
        metadata = self.metadata()
        metadata["series"] = False
        metadata["date"] = None if self.date is None else self.date[time_index]
        metadata["time"] = None if self.time is None else self.time[time_index]
        return type(self)(img=img, **metadata)

    def time_interval(self, indices: slice) -> "Image":
        """Restrict the temporal domain of a series."""
        if not self.series:
            raise ValueError("Image is not a time-series.")
        if not isinstance(indices, slice):
            raise ValueError("indices needs to be a slice")
        if self.scalar:
            img = self.img[..., indices]
        else:
            img = self.img[..., indices, :]
        metadata = self.metadata()
        metadata["date"] = None if self.date is None else self.date[indices]
        metadata["time"] = None if self.time is None else self.time[indices]
        return type(self)(img=img, **metadata)

    def slice(self, cut: Union[float, int], axis: Union[str, int]) -> "Image":
        """Extract a spatial slice normal to ``axis`` at position ``cut``.

        Cartesian (str) axes interpret ``cut`` as a coordinate; matrix (int)
        axes interpret it as a voxel index.
        """
        from ..signals.reduction.dimensionreduction import reduce_axis

        if isinstance(axis, str):
            full_coordinate = np.zeros(self.space_dim, dtype=float)
            full_coordinate["xyz"[: self.space_dim].find(axis)] = cut
            cut_voxel = self.coordinatesystem.voxel(full_coordinate)
            matrix_axis = to_matrix_indexing(axis, "xyz"[: self.space_dim])
            axis = "ijk".find(matrix_axis)
            cut = int(cut_voxel["ijk".find(matrix_axis)])

        reduced = reduce_axis(self, axis)
        if axis == 0:
            reduced.img = self.img[cut]
        elif axis == 1:
            reduced.img = self.img[:, cut]
        elif axis == 2:
            reduced.img = self.img[:, :, cut]
        return reduced

    def subregion(
        self, roi: Union[tuple, VoxelArray, CoordinateArray]
    ) -> "Image":
        """Extract a spatial subregion (box).

        Args:
            roi: tuple of voxel slices, a VoxelArray, or a CoordinateArray of
                (at least) ``space_dim`` Cartesian points spanning a box.

        """
        if isinstance(roi, CoordinateArray):
            voxels_box = self.coordinatesystem.voxel(roi)
            voxels = tuple(
                slice(
                    max(0, int(np.min(voxels_box[:, d]))),
                    min(int(np.max(voxels_box[:, d])), self.num_voxels[d]),
                )
                for d in range(self.space_dim)
            )
        elif isinstance(roi, VoxelArray):
            voxels = tuple(
                slice(
                    max(0, int(np.min(roi[:, d]))),
                    min(int(np.max(roi[:, d])), self.num_voxels[d]),
                )
                for d in range(self.space_dim)
            )
        elif isinstance(roi, tuple):
            voxels = roi
        else:
            raise ValueError(
                f"roi of type {type(roi)} not supported; need tuple of slices, "
                "VoxelArray, or CoordinateArray."
            )
        assert len(voxels) == self.space_dim

        origin_voxel = [0 if sl.start is None else sl.start for sl in voxels]
        origin = self.coordinatesystem.coordinate(origin_voxel)
        opposite_voxel = [
            self.num_voxels[i] if sl.stop is None else sl.stop
            for i, sl in enumerate(voxels)
        ]
        opposite = self.coordinatesystem.coordinate(opposite_voxel)

        cartesian_dimensions = np.absolute(np.asarray(opposite) - np.asarray(origin))
        dimensions = []
        for matrix_index in range(self.space_dim):
            axis = "ijk"[matrix_index]
            cartesian_index, _ = interpret_indexing(
                axis, "xyz"[: self.space_dim]
            )
            dimensions.append(float(cartesian_dimensions[cartesian_index]))

        img = self.img[voxels]
        metadata = self.metadata()
        metadata["dimensions"] = dimensions
        metadata["origin"] = origin
        return type(self)(img=img, **metadata)

    def eval(self, point, interpolation: str = "nearest") -> np.ndarray:
        """Evaluate the image at physical points or voxels (host-side)."""
        pts = np.atleast_2d(np.asarray(point))
        if isinstance(point, (Coordinate, CoordinateArray)) or (
            not isinstance(point, (Voxel, VoxelArray))
            and np.issubdtype(pts.dtype, np.floating)
        ):
            voxels = np.atleast_2d(np.asarray(self.coordinatesystem.voxel(pts)))
        else:
            voxels = pts.astype(int)
        voxels = np.clip(
            voxels, 0, np.array(self.num_voxels) - 1
        )
        data = self.as_numpy()
        values = data[tuple(voxels[:, d] for d in range(self.space_dim))]
        if np.asarray(point).ndim == 1:
            return values[0]
        return values

    # ------------------------------------------------------------ arithmetic

    def _compatible(self, other: "Image") -> bool:
        return (
            self.shape == other.shape
            and np.allclose(np.asarray(self.origin), np.asarray(other.origin))
            and np.allclose(self.dimensions, other.dimensions)
        )

    def __add__(self, other):
        if isinstance(other, Image):
            if not self._compatible(other):
                raise ValueError("Images not compatible.")
            result = self.copy()
            result.img = self.img + other.img
            return result
        result = self.copy()
        result.img = self.img + other
        return result

    def __radd__(self, other):
        if other == 0:
            return self.copy()
        return self.__add__(other)

    def __sub__(self, other):
        if isinstance(other, Image):
            if not self._compatible(other):
                raise ValueError("Images not compatible.")
            result = self.copy()
            result.img = self.img - other.img
            return result
        result = self.copy()
        result.img = self.img - other
        return result

    def __mul__(self, scalar):
        if isinstance(scalar, Image):
            result = self.copy()
            result.img = self.img * scalar.img
            return result
        result = self.copy()
        result.img = self.img * scalar
        return result

    __rmul__ = __mul__

    def __truediv__(self, scalar):
        result = self.copy()
        result.img = self.img / (scalar.img if isinstance(scalar, Image) else scalar)
        return result

    def __neg__(self):
        result = self.copy()
        result.img = -self.img
        return result

    # ------------------------------------------------------------------- I/O

    def save(self, path: Union[str, Path]) -> None:
        """Persist image (array + metadata) as npz."""
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path,
            array=self.as_numpy(),
            metadata=np.array([self.metadata()], dtype=object),
            image_class=type(self).__name__,
        )
        logger.info("Image saved to %s.", path)

    def to_vtk(self, path: Union[str, Path], name: str = "data") -> None:
        """Export to legacy VTK structured-points format (no pyevtk dep)."""
        from ..utils.plotting import to_vtk as _to_vtk

        _to_vtk(path, [(name, self)])

    # -------------------------------------------------------------- plotting

    def show(self, *args, **kwargs) -> None:
        """Display via matplotlib (host-side; no-op headless-safe)."""
        self.show_matplotlib(*args, **kwargs)

    def show_matplotlib(
        self,
        title: Optional[str] = None,
        duration: Optional[float] = None,
        **kwargs,
    ) -> None:
        import matplotlib.pyplot as plt

        data = self.as_numpy()
        if self.series:
            data = np.moveaxis(
                data, self.space_dim, 0
            )  # iterate time as leading axis
            frames = [data[i] for i in range(data.shape[0])]
        else:
            frames = [data]
        for idx, frame in enumerate(frames):
            fig, ax = plt.subplots()
            if self.space_dim == 2:
                if frame.ndim == 2:
                    im = ax.imshow(frame, cmap=kwargs.get("cmap", "viridis"))
                    fig.colorbar(im, ax=ax)
                else:
                    show_frame = frame
                    if np.issubdtype(show_frame.dtype, np.floating):
                        show_frame = np.clip(show_frame, 0, 1)
                    ax.imshow(show_frame)
            else:
                mid = frame.shape[0] // 2
                ax.imshow(frame[mid])
            ax.set_title(title or self.name or f"frame {idx}")
            if duration is None:
                plt.show()
            else:
                plt.show(block=False)
                plt.pause(duration)
                plt.close(fig)

    def show_plain(self, **kwargs) -> None:
        self.show_matplotlib(**kwargs)

    def show_plotly(
        self,
        title: str = "",
        duration: Optional[int] = None,
        **kwargs,
    ) -> None:
        """Show via plotly (reference ``image/image.py:1443-1745``).

        2d images render as ``px.imshow`` with physical axes; 3d scalar
        images as thresholded Scatter3d / Volume figures per time step.
        Capability-gated on plotly (like pydicom/meshio for imread).

        Args:
            title: window title.
            duration: unused (plotly windows are browser-based).
            **kwargs: threshold (float), relative (bool), view
                ("scatter"|"voxel"), surpress_2d / surpress_3d (bool).

        """
        try:
            import plotly.express as px
            import plotly.graph_objects as go
        except ImportError as exc:  # pragma: no cover
            raise ImportError(
                "show_plotly requires plotly; install it or use "
                "show_matplotlib()."
            ) from exc

        figures = self._plotly_figures(px, go, title, **kwargs)
        for fig in figures:
            fig.show()

    def _frame_label(self, title: str, time_index: int) -> str:
        """Figure label for one time step ("<title> - <k> - <t> sec.")."""
        if not self.series:
            return title
        stamp = str(time_index)
        if self.time is not None and self.time[time_index] is not None:
            stamp = f"{time_index} - {self.time[time_index]} sec."
        return f"{title} - {stamp}" if title else stamp

    def _frame_at(self, data: np.ndarray, time_index: int) -> np.ndarray:
        """Slice one time step out of the (space, time, range) array."""
        if not self.series:
            return data
        return data[..., time_index] if self.scalar else data[..., time_index, :]

    def _physical_axis(self, plot_axis: int) -> np.ndarray:
        """Voxel positions along an x/y plot axis, in physical coordinates.

        Delegates to the image's coordinate system — the single owner of
        origin/orientation conventions — instead of re-deriving sign and
        offset at the plotting layer.
        """
        matrix_axis, _ = interpret_indexing("xy"[plot_axis], "ij")
        ids = np.zeros((self.num_voxels[matrix_axis], self.space_dim))
        ids[:, matrix_axis] = np.arange(self.num_voxels[matrix_axis])
        return np.asarray(self.coordinatesystem.coordinate(ids))[:, plot_axis]

    def _plotly_figures(self, px, go, title: str = "", **kwargs) -> list:
        """Build one plotly figure per time step (browser-free, testable).

        Capability parity with reference ``image/image.py:1443`` (2d imshow
        with physical axes; 3d thresholded scatter / volume views).
        """
        if self.space_dim == 2 and kwargs.get("surpress_2d", False):
            return []
        if self.space_dim == 3 and kwargs.get("surpress_3d", False):
            return []
        data = self.as_numpy()
        if self.space_dim == 2:
            return [
                self._plotly_2d(px, self._frame_at(data, k), self._frame_label(title, k))
                for k in range(self.time_num)
            ]
        return [
            self._plotly_3d(go, self._frame_at(data, k), **kwargs)
            for k in range(self.time_num)
        ]

    def _plotly_2d(self, px, frame: np.ndarray, label: str):
        arr = np.asarray(frame, dtype=float)
        if np.issubdtype(np.asarray(frame).dtype, np.integer):
            arr = arr / np.iinfo(np.asarray(frame).dtype).max
        return px.imshow(
            arr,
            title=label,
            x=self._physical_axis(0),
            y=self._physical_axis(1),
            aspect="equal",
        )

    def _plotly_3d(self, go, frame: np.ndarray, **kwargs):
        assert self.scalar, "3d plotly views need scalar images."
        arr = np.asarray(frame)
        lo, hi = float(arr.min()), float(arr.max())
        threshold = kwargs.get("threshold", lo)
        if kwargs.get("relative", False):
            threshold = lo + threshold * (hi - lo)
        ids = np.indices(arr.shape[:3]).reshape(3, -1).T
        xyz = np.asarray(self.coordinatesystem.coordinate(ids)).T
        values = arr.reshape(-1)
        if kwargs.get("view", "scatter").lower() == "scatter":
            keep = values > threshold
            trace = go.Scatter3d(
                x=xyz[0][keep],
                y=xyz[1][keep],
                z=xyz[2][keep],
                mode="markers",
                marker=dict(
                    size=3,
                    color=values[keep],
                    colorscale="Viridis",
                    opacity=0.5,
                ),
            )
        else:
            trace = go.Volume(
                x=xyz[0],
                y=xyz[1],
                z=xyz[2],
                value=values,
                isomin=threshold,
                isomax=hi,
                opacity=0.5,
                surface_count=10,
            )
        return go.Figure(data=trace)

    # --------------------------------------------------------------- pytree

    def tree_flatten(self):
        children = (self.img,)
        aux = (type(self), _freeze_metadata(self.metadata()))
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        klass, frozen_meta = aux
        return klass(img=children[0], **_thaw_metadata(frozen_meta))


def _freeze_metadata(meta: dict) -> tuple:
    """Freeze a metadata dict into a hashable structure for pytree aux."""

    def freeze(v):
        if isinstance(v, np.ndarray):
            return ("__ndarray__", v.tobytes(), v.dtype.str, v.shape)
        if isinstance(v, list):
            return ("__list__",) + tuple(freeze(x) for x in v)
        return v

    return tuple(sorted((k, freeze(v)) for k, v in meta.items()))


def _thaw_metadata(frozen: tuple) -> dict:
    def thaw(v):
        if isinstance(v, tuple) and v and v[0] == "__ndarray__":
            return np.frombuffer(v[1], dtype=np.dtype(v[2])).reshape(v[3])
        if isinstance(v, tuple) and v and v[0] == "__list__":
            return [thaw(x) for x in v[1:]]
        return v

    return {k: thaw(v) for k, v in frozen}


class ScalarImage(Image):
    """Scalar-valued image (no range axes)."""

    def __init__(self, img, transformations=None, **kwargs):
        kwargs["scalar"] = True
        super().__init__(img, transformations, **kwargs)

    def write(self, path: Union[str, Path], **kwargs) -> None:
        """Write to image/data file; format by suffix (png/jpg/tif/npy/csv)."""
        path = Path(path)
        suffix = path.suffix.lower()
        data = self.as_numpy()
        path.parent.mkdir(parents=True, exist_ok=True)
        if suffix in (".png", ".jpg", ".jpeg", ".tif", ".tiff"):
            import cv2

            quality = kwargs.get("quality", 90)
            if np.issubdtype(data.dtype, np.floating):
                data = np.clip(data, 0, 1)
                data = (data * 255).astype(np.uint8)
            params = (
                [int(cv2.IMWRITE_JPEG_QUALITY), quality]
                if suffix in (".jpg", ".jpeg")
                else []
            )
            cv2.imwrite(str(path), data, params)
        elif suffix == ".npy":
            np.save(path, data)
        elif suffix == ".csv":
            np.savetxt(path, data.reshape(data.shape[0], -1), delimiter=",")
        else:
            raise NotImplementedError(f"Suffix {suffix} not supported.")
        logger.info("Image written to %s.", path)

    def to_csv(
        self,
        path: Union[str, Path],
        *,
        delimiter: str = ",",
        header: Optional[str] = None,
        float_format: str = "{:.2e}",
    ) -> None:
        """Write cell-center coordinates + values as CSV rows
        (reference image.py:1975-2062): one line per voxel,
        ``x[, y[, z]], value``."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        arr = self.as_numpy()
        if arr.ndim != self.space_dim:
            raise ValueError(
                "to_csv requires a non-series scalar image (array rank == "
                "space_dim)."
            )
        if self.space_dim not in (1, 2, 3):
            raise ValueError("to_csv supports only 1D/2D/3D images.")
        use_header = None if header is None else str(header).strip()
        if use_header is not None and use_header.lower() == "none":
            use_header = None
        if use_header is not None:
            columns = [part.strip() for part in use_header.split(delimiter)]
            if len(columns) != self.space_dim + 1:
                raise ValueError(
                    f"CSV header must provide {self.space_dim + 1} columns."
                )
        centers = (
            np.stack(
                np.meshgrid(*(np.arange(n) for n in arr.shape), indexing="ij"),
                axis=-1,
            ).reshape(-1, self.space_dim)
            + 0.5
        )
        coords = np.asarray(
            self.coordinatesystem.coordinate(centers), dtype=float
        )
        fmt = float_format.strip()
        if fmt.startswith("{:") and fmt.endswith("}"):
            fmt = "%" + fmt[2:-1]
        table = np.concatenate(
            [coords, arr.reshape(-1, 1).astype(float)], axis=1
        )
        np.savetxt(
            path,
            table,
            delimiter=delimiter,
            fmt=fmt,
            header=use_header or "",
            comments="",
        )
        logger.info("Image written to %s.", path)


class ExtensiveImage(ScalarImage):
    """Image of an extensive (integrable) quantity.

    Inherits the scalar write/export surface (the reference declares
    ``ExtensiveImage(ScalarImage)``, image.py:2064)."""


class OpticalImage(Image):
    """Trichromatic optical photograph (RGB range axis).

    Reference parity: ``src/darsia/image/image.py:2081-2384``.
    """

    def __init__(self, img, transformations=None, **kwargs):
        kwargs["scalar"] = False
        kwargs["space_dim"] = 2
        # Track the current color space (reference image.py:2113-2119).
        self.color_space = str(kwargs.pop("color_space", "RGB")).upper()
        super().__init__(img, transformations, **kwargs)

    def metadata(self) -> dict:
        meta = super().metadata()
        meta["color_space"] = self.color_space
        return meta

    def to_trichromatic(self, color_space: str, return_image: bool = False):
        """Convert to another trichromatic color space (RGB/BGR/HSV/LAB/HLS).

        Converts from the image's *current* color space (reference
        image.py:2278-2318); all conversions run as jitted JAX programs
        (no OpenCV on the hot path).
        """
        from ..ops import color as color_ops

        color_space = color_space.upper()
        if color_space == self.color_space:
            return self.copy() if return_image else None
        data = jnp.asarray(self.img)
        converted = color_ops.convert_trichromatic(
            data, self.color_space, color_space
        )
        if return_image:
            image = self.copy()
            image.img = converted
            image.color_space = color_space
            return image
        self.img = converted
        self.color_space = color_space
        return None

    def to_monochromatic(self, key: str) -> ScalarImage:
        """Extract a monochromatic (scalar) view: gray/red/green/blue/..."""
        from ..ops import color as color_ops

        data = jnp.asarray(self.img)
        if self.color_space != "RGB":
            data = color_ops.convert_trichromatic(data, self.color_space, "RGB")
        mono = color_ops.to_monochromatic(data, key)
        metadata = self.metadata()
        metadata.pop("scalar", None)
        metadata["name"] = key
        return ScalarImage(mono, **metadata)

    def add_grid(
        self,
        origin: Optional[Union[list, np.ndarray]] = None,
        dx: float = 1.0,
        dy: float = 1.0,
        color: tuple = (125, 125, 125),
        thickness: int = 9,
    ) -> "OpticalImage":
        """Overlay a Cartesian grid (host-side drawing, setup/visual only)."""
        if origin is None:
            origin = np.asarray(self.origin)
        origin = np.asarray(origin, dtype=float)
        data = np.array(self.as_numpy(), copy=True)
        float_input = np.issubdtype(data.dtype, np.floating)
        if float_input:
            draw_color = tuple(c / 255.0 for c in color)
        else:
            draw_color = color

        cs = self.coordinatesystem
        num_h = int(np.ceil(self.dimensions[1] / dx)) + 1
        num_v = int(np.ceil(self.dimensions[0] / dy)) + 1
        h, w = self.num_voxels[:2]

        # Vertical lines (constant x)
        for n in range(-num_h, num_h + 1):
            x = origin[0] + n * dx
            col = int(np.asarray(cs.voxel(np.array([x, origin[1]])))[1])
            if 0 <= col < w:
                data[:, max(col - thickness // 2, 0) : col + thickness // 2 + 1, :3] = (
                    draw_color[:3]
                )
        # Horizontal lines (constant y)
        for n in range(-num_v, num_v + 1):
            y = origin[1] + n * dy
            row = int(np.asarray(cs.voxel(np.array([origin[0], y])))[0])
            if 0 <= row < h:
                data[max(row - thickness // 2, 0) : row + thickness // 2 + 1, :, :3] = (
                    draw_color[:3]
                )
        return OpticalImage(img=data, **self.metadata())

    def write(self, path: Union[str, Path], **kwargs) -> None:
        """Write RGB image to png/jpg/tif."""
        import cv2

        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        data = self.as_numpy()
        if np.issubdtype(data.dtype, np.floating):
            data = (np.clip(data, 0, 1) * 255).astype(np.uint8)
        bgr = data[..., ::-1]
        quality = kwargs.get("quality", 90)
        params = (
            [int(cv2.IMWRITE_JPEG_QUALITY), quality]
            if path.suffix.lower() in (".jpg", ".jpeg")
            else []
        )
        cv2.imwrite(str(path), bgr, params)

    def encode(self, suffix: str, **kwargs) -> bytes:
        """Encode the image to compressed bytes without touching disk
        (reference image.py:2217-2276) — the streaming-preview payload."""
        import cv2

        suffix = suffix.lower()
        if not suffix.startswith("."):
            suffix = "." + suffix
        data = self.as_numpy()
        if np.issubdtype(data.dtype, np.floating):
            data = (np.clip(data, 0, 1) * 255).astype(np.uint8)
        bgr = data[..., ::-1]
        if suffix in (".jpg", ".jpeg"):
            params = [int(cv2.IMWRITE_JPEG_QUALITY), kwargs.get("quality", 90)]
        elif suffix == ".png":
            params = [
                int(cv2.IMWRITE_PNG_COMPRESSION), kwargs.get("compression", 6)
            ]
        else:
            params = []
        ok, buf = cv2.imencode(suffix, bgr, params)
        if not ok:
            raise ValueError(f"Encoding to {suffix} failed.")
        return bytes(buf.tobytes())


# Register Image and subclasses as JAX pytrees.
for _cls in (Image, ScalarImage, ExtensiveImage, OpticalImage):
    jax.tree_util.register_pytree_node(
        _cls,
        _cls.tree_flatten,
        _cls.tree_unflatten,
    )
