"""Format-dispatched image reading (host-side I/O -> device arrays).

Reads npy / npz / jpg / png / tif / dcm / vtu into physical
:class:`~darsia_tpu.image.image.Image` objects.  All file decoding is host
CPU work (cv2 / PIL / pydicom / meshio); the resulting array is promoted to a
JAX device array by the Image constructor so that the transformation chain
runs on TPU.

Parity: reference ``src/darsia/image/imread.py:34-965``.  DICOM and VTU
support is capability-gated: it activates when ``pydicom`` / ``meshio`` are
installed and raises a clear error otherwise.
"""

from __future__ import annotations

import logging
import time as _time
from datetime import datetime
from pathlib import Path
from typing import Optional, Union

import numpy as np

from .image import ExtensiveImage, Image, OpticalImage, ScalarImage

logger = logging.getLogger(__name__)

__all__ = [
    "imread",
    "imread_from_bytes",
    "imread_from_numpy",
    "imread_from_npz",
    "imread_from_optical",
    "imread_from_dicom",
    "imread_from_vtu",
]

_CLASSES = {
    "Image": Image,
    "ScalarImage": ScalarImage,
    "OpticalImage": OpticalImage,
    "ExtensiveImage": ExtensiveImage,
}


def imread(path, **kwargs) -> Image:
    """Read image(s) from file; format dispatch by suffix.

    Args:
        path: path(s) to file(s) or folder(s).
        kwargs: format-specific options, forwarded.

    Returns:
        Image (series if multiple paths given).

    """
    tic = _time.time()
    if isinstance(path, list):
        path = [Path(p) for p in path]
    else:
        path = Path(path)

    # Expand folders.
    if isinstance(path, Path) and path.is_dir():
        path = sorted(p for p in path.glob("*") if p.is_file())
    elif isinstance(path, list) and all(p.is_dir() for p in path):
        expanded: list[Path] = []
        for p in path:
            expanded.extend(q for q in p.glob("*") if q.is_file())
        path = sorted(expanded)

    if isinstance(path, list):
        assert all(p.exists() for p in path), "Not all files exist."
    else:
        assert path.exists(), f"File {path} does not exist."

    suffix = kwargs.get("suffix", None)
    if suffix is None:
        suffix = (path[0] if isinstance(path, list) else path).suffix
        suffix = str(suffix).lower()

    if suffix == ".npy":
        image = imread_from_numpy(path, **kwargs)
    elif suffix == ".npz":
        image = imread_from_npz(path, **kwargs)
    elif suffix in (".jpg", ".jpeg", ".png", ".tif", ".tiff"):
        image = imread_from_optical(path, **kwargs)
    elif suffix == ".dcm":
        image = imread_from_dicom(path, **kwargs)
    elif suffix == ".vtu":
        image = imread_from_vtu(path, **kwargs)
    else:
        raise NotImplementedError(f"Filetype {suffix} not supported.")

    logger.info("Image reading for %s took %.2f s.", path, _time.time() - tic)
    return image


def imread_from_bytes(data: bytes, transformations=None, **kwargs) -> Image:
    """Decode an in-memory encoded image (png/jpg bytes)."""
    import cv2

    array = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED)
    if array is None:
        raise ValueError("Could not decode image bytes.")
    if array.ndim == 3 and array.shape[-1] == 3:
        array = cv2.cvtColor(array, cv2.COLOR_BGR2RGB)
        return OpticalImage(img=array, transformations=transformations, **kwargs)
    if array.ndim == 2:
        return ScalarImage(img=array, transformations=transformations, **kwargs)
    if array.ndim == 3 and array.shape[-1] == 1:
        return ScalarImage(
            img=array[..., 0], transformations=transformations, **kwargs
        )
    raise NotImplementedError


def imread_from_numpy(path, **kwargs) -> Image:
    """Read a raw npy array (path or in-memory ndarray) as an Image."""
    if isinstance(path, np.ndarray):
        return Image(path, **kwargs)
    if isinstance(path, list) and path and isinstance(path[0], np.ndarray):
        array = np.stack(path, axis=kwargs.get("space_dim", 2))
        kwargs.setdefault("series", True)
        return Image(array, **kwargs)
    if isinstance(path, list):
        arrays = [np.load(p, allow_pickle=True) for p in path]
        array = np.stack(arrays, axis=kwargs.get("space_dim", 2))
        kwargs.setdefault("series", True)
        return Image(array, **kwargs)
    array = np.load(path, allow_pickle=True)
    return Image(array, **kwargs)


def imread_from_npz(path, transformations=None, **kwargs) -> Image:
    """Read an Image previously persisted via ``Image.save``."""
    npzdata = np.load(path, allow_pickle=True)
    array = npzdata["array"]
    metadata = npzdata["metadata"][0] if npzdata["metadata"].ndim else npzdata[
        "metadata"
    ].item()
    if isinstance(metadata, np.ndarray):
        metadata = metadata.item()
    cls_name = None
    if "image_class" in npzdata:
        cls_name = str(npzdata["image_class"])
    cls_name = metadata.pop("type", cls_name) or "Image"
    metadata.update(kwargs)
    klass = _CLASSES.get(cls_name, Image)
    return klass(array, transformations=transformations, **metadata)


# ---------------------------------------------------------------------- JPG


def _read_single_optical(path: Path, color_space: str = "RGB") -> np.ndarray:
    import cv2

    array = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if array is None:
        raise ValueError(f"Could not read image {path}.")
    if array.ndim == 3 and array.shape[-1] == 3:
        array = cv2.cvtColor(array, cv2.COLOR_BGR2RGB)
    return array


def _exif_date(path: Path) -> Optional[datetime]:
    """Acquisition datetime from EXIF, if present."""
    try:
        from PIL import Image as PILImage
        from PIL.ExifTags import TAGS

        with PILImage.open(path) as im:
            exif = im.getexif()
            if not exif:
                return None
            for tag_id, value in exif.items():
                if TAGS.get(tag_id) in ("DateTimeOriginal", "DateTime"):
                    return datetime.strptime(str(value), "%Y:%m:%d %H:%M:%S")
    except Exception:  # noqa: BLE001 — EXIF is best-effort
        return None
    return None


def imread_from_optical(
    path,
    time=None,
    transformations=None,
    transfer: Optional[str] = None,
    **kwargs,
) -> OpticalImage:
    """Read jpg/png/tif photograph(s) into OpticalImage(s).

    A list of paths yields a space-time series image.

    ``transfer="yuv420"`` ships each decoded frame to the device as a
    full-res luma plane + 2x2-subsampled chroma (1.5 bytes/pixel instead
    of 3) and reconstructs RGB on-device — JPEGs store chroma
    4:2:0-subsampled anyway, so the loss is a fraction of a uint8 level
    (see :mod:`darsia_tpu.utils.transfer`).  Use it when the host-device
    link, not the decode, bounds the ingest loop.
    """
    kwargs.pop("suffix", None)

    def promote(arr: np.ndarray):
        if (
            transfer == "yuv420"
            and arr.ndim == 3
            and arr.shape[-1] == 3
            and arr.dtype == np.uint8
        ):
            from ..utils.transfer import put_rgb_yuv420

            return put_rgb_yuv420(arr)
        return arr

    if isinstance(path, list):
        arrays = [promote(_read_single_optical(p)) for p in path]
        dates = kwargs.pop("date", None)
        if dates is None:
            dates = [_exif_date(p) for p in path]
        if any(not isinstance(a, np.ndarray) for a in arrays):
            import jax.numpy as jnp

            array = jnp.stack(arrays, axis=2)
        else:
            array = np.stack(arrays, axis=2)  # time axis after 2 space dims
        image = OpticalImage(
            img=array,
            series=True,
            date=dates,
            time=time,
            transformations=transformations,
            **kwargs,
        )
        return image

    array = promote(_read_single_optical(path))
    date = kwargs.pop("date", None)
    if date is None:
        date = _exif_date(path)
    return OpticalImage(
        img=array,
        date=date,
        time=time,
        transformations=transformations,
        **kwargs,
    )


# --------------------------------------------------------------------- DICOM


def imread_from_dicom(path, **kwargs) -> ScalarImage:
    """Read DICOM slice stack(s) into a 3d (series) ScalarImage.

    Requires ``pydicom`` (capability-gated; reference
    ``src/darsia/image/imread.py:327``).
    """
    try:
        import pydicom
        from pydicom.pixel_data_handlers.util import apply_modality_lut
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "DICOM support requires pydicom; install it to use imread on .dcm."
        ) from exc

    paths = path if isinstance(path, list) else [path]
    slices = []
    for p in paths:
        ds = pydicom.dcmread(str(p))
        data = apply_modality_lut(ds.pixel_array, ds)
        slices.append((ds, data))

    # Sort by slice location / instance number.
    def sort_key(item):
        ds = item[0]
        return float(getattr(ds, "SliceLocation", getattr(ds, "InstanceNumber", 0)))

    slices.sort(key=sort_key)
    volume = np.stack([d for _, d in slices], axis=0)
    ds0 = slices[0][0]
    spacing = [float(s) for s in getattr(ds0, "PixelSpacing", [1.0, 1.0])]
    thickness = float(getattr(ds0, "SliceThickness", 1.0))
    dimensions = [
        thickness * volume.shape[0],
        spacing[0] * volume.shape[1],
        spacing[1] * volume.shape[2],
    ]
    kwargs.setdefault("dimensions", dimensions)
    kwargs.setdefault("space_dim", 3)
    return ScalarImage(volume, **kwargs)


# ----------------------------------------------------------------------- VTU


def imread_from_vtu(path, key: str = "data", **kwargs) -> Image:
    """Read vtu unstructured data, resampled onto a regular voxel grid.

    Requires ``meshio`` (capability-gated; reference
    ``src/darsia/image/imread.py:537``).
    """
    try:
        import meshio
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "VTU support requires meshio; install it to use imread on .vtu."
        ) from exc

    paths = path if isinstance(path, list) else [path]
    arrays = []
    for p in paths:
        mesh = meshio.read(str(p))
        arrays.append(_resample_vtu(mesh, key, **kwargs))
    if len(arrays) == 1:
        data, dimensions = arrays[0]
        kwargs.setdefault("dimensions", dimensions)
        kwargs.pop("shape", None)
        return ScalarImage(data, **kwargs)
    data = np.stack([a for a, _ in arrays], axis=2)
    kwargs.setdefault("dimensions", arrays[0][1])
    kwargs.pop("shape", None)
    return ScalarImage(data, series=True, **kwargs)


def _resample_vtu(mesh, key: str, **kwargs):
    """Nearest-cell resampling of unstructured data onto a regular grid."""
    from scipy.interpolate import griddata  # host-side setup path

    points = mesh.points[:, :2]
    values = None
    if key in mesh.point_data:
        values = np.asarray(mesh.point_data[key]).squeeze()
        sample_pts = points
    else:
        for block, data in zip(mesh.cells, mesh.cell_data.get(key, [])):
            centers = mesh.points[block.data].mean(axis=1)[:, :2]
            values = np.asarray(data).squeeze()
            sample_pts = centers
            break
    if values is None:
        raise KeyError(f"Key {key} not found in vtu data.")

    shape = kwargs.get("shape", (200, 200))
    xmin, ymin = points.min(axis=0)
    xmax, ymax = points.max(axis=0)
    gy, gx = np.meshgrid(
        np.linspace(ymax, ymin, shape[0]),
        np.linspace(xmin, xmax, shape[1]),
        indexing="ij",
    )
    grid = griddata(sample_pts, values, (gx, gy), method="linear", fill_value=0.0)
    dimensions = [ymax - ymin, xmax - xmin]
    return grid, dimensions
