"""Wasserstein-1 distances between mass distributions (Beckmann form).

Mirrors reference examples/wasserstein.py and wasserstein_split_square.py.
The 10x10 two-squares problem has the known exact distance ~0.3795.
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da

# Two unit masses displaced diagonally on a 10x10 grid.
src = np.zeros((10, 10))
dst = np.zeros((10, 10))
src[2:5, 2:5] = 1.0
dst[5:8, 5:8] = 1.0
meta = {"width": 1.0, "height": 1.0, "scalar": True}
img_src = da.Image(src, **meta)
img_dst = da.Image(dst, **meta)

for method in ("newton", "bregman"):
    distance = da.wasserstein_distance(
        img_src, img_dst, method=method,
        options={"num_iter": 200, "tol_residual": 1e-7},
    )
    print(f"W1 ({method}): {float(distance):.6f}  (exact ~0.379544)")

# EMD cross-check (cv2-based).
emd = da.EMD()
print("EMD:", float(emd(img_src, img_dst)))
