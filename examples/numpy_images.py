"""Construct images from raw numpy arrays.

Mirrors reference examples/numpy_images.py.
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da

# Scalar image from a plain array with physical dimensions.
array = np.linspace(0, 1, 50 * 80).reshape(50, 80).astype(np.float32)
image = da.imread_from_numpy(array, width=0.8, height=0.5, scalar=True)
print("scalar image:", np.asarray(image.img).shape, image.dimensions)

# Optical (RGB) image.
rgb = np.stack([array, array**2, np.sqrt(array)], axis=-1)
optical = da.imread_from_numpy(rgb, width=0.8, height=0.5)
print("optical image:", type(optical).__name__)

# Series: stack several time steps.
series = da.stack([image, da.weight(image, 0.5)])
print("series time steps:", series.time_num)
