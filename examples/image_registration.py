"""Image registration: recover a deformation between two images.

Mirrors reference examples/image_registration.py.
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da
from _data import load_co2_series

fast = _data.fast_mode()
images = load_co2_series(shape=(128, 192) if fast else (256, 384))
img_src, img_dst = images[0], images[1]

registration = da.ImageRegistration(
    img_dst, N_patches=[4, 6] if fast else [8, 12], rtol=0.05
)
transformed = registration(img_src)
print("registered image:", np.asarray(transformed.img).shape)

displacement = registration.displacement()
print("displacement field:", np.asarray(displacement).shape,
      "max |disp| [m]:", float(np.abs(np.asarray(displacement)).max()))
