"""Restoration: TV denoising (Chambolle + split Bregman) and H1.

Mirrors reference examples/regularization.py.
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da
from _data import load_baseline

image = load_baseline(shape=(135, 256)).to_monochromatic("gray")
noisy = image.copy()
rng = np.random.default_rng(0)
noisy.img = np.asarray(image.img) + 0.1 * rng.standard_normal(
    np.asarray(image.img).shape
).astype(np.float32)

for method in ("chambolle", "isotropic bregman"):
    denoised = da.tvd(noisy, method=method, weight=0.1, max_num_iter=100)
    residual = float(
        np.abs(np.asarray(denoised.img) - np.asarray(image.img)).mean()
    )
    print(f"{method}: mean abs error {residual:.4f}")

smooth = da.H1_regularization(noisy, mu=1.0, omega=1.0)
print("H1 output:", np.asarray(smooth.img).shape)
