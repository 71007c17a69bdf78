"""Wasserstein-1 distances between mass distributions (Beckmann form).

Mirrors reference examples/wasserstein.py and wasserstein_split_square.py:
the 10x10 two-squares problem with the reference anchor distance
0.379543951823 (ref tests/unit/test_wasserstein.py:38).
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da

# The reference anchor problem: one 3x3 square mapped onto a 2x1 + 3x2
# split, masses normalized to 1 via physical integration.
src = np.zeros((10, 10))
src[2:5, 2:5] = 1.0
dst = np.zeros((10, 10))
dst[1:3, 1:2] = 1.0
dst[4:7, 7:9] = 1.0
meta = {"width": 1.0, "height": 1.0, "scalar": True}
img_src = da.Image(src, **meta)
img_dst = da.Image(dst, **meta)

# Normalize both distributions to unit physical mass (like the reference
# example does) — the Beckmann solvers require equal-mass inputs, and the
# anchor value corresponds to unit total mass.
geometry = da.Geometry(**img_src.shape_metadata())
img_src.img = np.asarray(img_src.img) / geometry.integrate(img_src)
img_dst.img = np.asarray(img_dst.img) / geometry.integrate(img_dst)

for method in ("newton", "bregman"):
    distance = da.wasserstein_distance(
        img_src, img_dst, method=method,
        options={"num_iter": 400, "tol_residual": 1e-3,
                 "tol_increment": 1e-3, "tol_distance": 1e-3,
                 "L": 1e9 if method == "newton" else 1.0},
    )
    print(f"W1 ({method}): {float(distance):.6f}  (reference 0.379544)")
    assert abs(float(distance) - 0.379543951823) < 0.02

# EMD cross-check (cv2-based, host-side).
emd_distance = float(da.EMD()(img_src, img_dst))
print(f"W1 (cv2.EMD): {emd_distance:.6f}  (reference 0.379544)")
assert abs(emd_distance - 0.379543951823) < 0.02
