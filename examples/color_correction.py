"""Color corrections: white balance, color checker, illumination.

Mirrors reference examples/color_correction.py.
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da
from _data import load_baseline

image = load_baseline()

# Classic checker correction needs a detected checker; synthesize one.
arr = np.asarray(image.img).copy()
ref = da.ColorCheckerAfter2014().swatches_rgb
r0, c0, cell = 10, 10, 12
for i in range(4):
    for j in range(6):
        arr[r0 + i * cell:r0 + (i + 1) * cell,
            c0 + j * cell:c0 + (j + 1) * cell] = 0.9 * ref[i, j]
with_checker = da.Image(arr, **image.metadata())

checker, voxels = da.find_colorchecker(with_checker, "upper_left")
correction = da.ColorCorrection(with_checker, config={"roi": voxels})
corrected = correction(with_checker)
print("corrected swatch error:",
      float(np.abs(np.asarray(checker.swatches_rgb) - ref).mean()))

# Closed-form balances: map observed swatches onto the reference swatches.
balance = da.AdaptiveBalance()
balanced = balance(
    np.asarray(with_checker.img),
    np.asarray(checker.swatches_rgb).reshape(-1, 3),
    ref.reshape(-1, 3),
)
print("adaptive balance output shape:", np.asarray(balanced).shape)
