"""4d space-time image handling (DICOM-style medical/CT data).

Mirrors reference examples/dicom_images.py: read a 4d space-time image,
slice it in time, restrict to a spatial ROI, and reduce the z-axis by
vertical averaging.  DICOM ingest itself (``darsia.imread`` on .dcm via
pydicom) is capability-gated; without pydicom or sample files the same 4d
API surface is exercised on a synthesized space-time volume.
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as darsia
from _data import images_folder

folder = images_folder()
dicom_folder = folder / "dicom" if folder is not None else None

try:
    import pydicom  # noqa: F401

    HAVE_PYDICOM = True
except ImportError:
    HAVE_PYDICOM = False

if HAVE_PYDICOM and dicom_folder is not None and dicom_folder.exists():
    paths = sorted(dicom_folder.glob("*.dcm"))
    dicom_image_4d = darsia.imread(paths, dim=3)
else:
    # Synthetic 4d space-time volume: a blob drifting through time.
    T, Z, Y, X = 12, 16, 24, 24
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, Z), np.linspace(-1, 1, Y), np.linspace(-1, 1, X),
        indexing="ij",
    )
    frames = [
        np.exp(-8 * ((zz - 0.05 * t) ** 2 + yy**2 + (xx + 0.04 * t) ** 2))
        for t in range(T)
    ]
    dicom_image_4d = darsia.ScalarImage(
        np.stack(frames, axis=-1),  # time as trailing series axis
        dimensions=[1.6, 2.4, 2.4],
        series=True,
        dim=3,
        time=[float(10 * t) for t in range(T)],
    )

print(f"dimensions of the space-time image: {dicom_image_4d.dimensions}")
print(f"the time series holds {dicom_image_4d.time_num} images")

# Extract one 3d time slice.
dicom_image_3d_slice = dicom_image_4d.time_slice(9)
print("3d slice shape:", dicom_image_3d_slice.shape)

# Extract a time interval.
dicom_image_4d_interval = dicom_image_4d.time_interval(slice(8, 10))
print("interval length:", dicom_image_4d_interval.time_num)

# Restrict to an ROI in the z-direction.
nz = dicom_image_4d.num_voxels[0]
roi_z = slice(nz // 4, 3 * nz // 4)
dicom_image_roi = dicom_image_4d_interval.subregion(
    (roi_z, slice(0, None), slice(0, None))
)
print("roi shape:", dicom_image_roi.shape)

# Vertically average the z-direction -> 2d-in-space series.
vertical_averaging = darsia.AxisReduction(axis="z", dim=3)
dicom_image_2d_series = vertical_averaging(dicom_image_roi)
print(
    "reduced series:",
    dicom_image_2d_series.shape,
    "space_dim:",
    dicom_image_2d_series.space_dim,
)
assert dicom_image_2d_series.space_dim == 2
