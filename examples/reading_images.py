"""Reading images into physical-coordinate Image objects.

Mirrors reference examples/reading_images.py.
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da
from _data import load_baseline

# Images carry physical dimensions; matrix indexing with origin top-left,
# Cartesian coordinates with origin bottom-left.
image = load_baseline()
print("shape:", np.asarray(image.img).shape)
print("dimensions [m]:", image.dimensions)
print("origin:", image.origin)

# Coordinate <-> voxel mapping.
center_voxel = [image.num_voxels[0] // 2, image.num_voxels[1] // 2]
center_coordinate = image.coordinatesystem.coordinate(center_voxel)
print("center voxel:", center_voxel, "-> coordinate:", center_coordinate)
print("back to voxel:", image.coordinatesystem.voxel(center_coordinate))

# Subregions in physical coordinates.
sub = image.subregion(da.make_coordinate(np.array([[0.5, 0.25], [1.5, 1.0]])))
print("subregion voxels:", np.asarray(sub.img).shape)

# Monochromatic views.
gray = image.to_monochromatic("gray")
print("gray range:", float(np.min(np.asarray(gray.img))),
      float(np.max(np.asarray(gray.img))))
