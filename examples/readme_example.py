"""First steps with physical-coordinate images.

Mirrors reference examples/readme_example.py (show() calls are gated for
headless runs).
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da
from _data import images_folder, load_baseline

# Create an Image: a device array that also carries physical metadata.
folder = images_folder()
if folder is not None:
    image = da.imread(folder / "baseline.jpg", width=2.8, height=1.5)
else:
    image = load_baseline()

# Take a look (opens a window when a display is available).
import darsia_tpu.assistants.base_assistant as ba

if ba.interactive_available():
    image.show()

# Copy the image and add a grid on top of it.
grid_image = image.add_grid(dx=0.1, dy=0.1)
print("grid image:", np.asarray(grid_image.img).shape)

# Extract a region of interest (box defined by two coordinates).
roi = da.make_coordinate(np.array([[1.5, 0.0], [2.8, 0.7]]))
roi_image = image.subregion(roi)
print("ROI voxels:", np.asarray(roi_image.img).shape)

# Metadata travels with the image.
metadata = image.metadata()
print("metadata keys:", sorted(metadata.keys()))

# The underlying array is a JAX device array.
array = image.img
print("array type:", type(array).__name__, "dtype:", array.dtype)
