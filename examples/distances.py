"""Distance measures between mass distributions: W1 (Beckmann) vs EMD.

Mirrors reference examples/distances.py.
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da

# Two Gaussian blobs.
n = 64
yy, xx = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij")
blob = lambda cy, cx: np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 0.01)
src = da.Image(blob(0.3, 0.3), width=1.0, height=1.0, scalar=True)
dst = da.Image(blob(0.7, 0.6), width=1.0, height=1.0, scalar=True)

# Normalize to unit mass (as the reference test suite does) so W1 and the
# internally-normalized cv2 EMD are directly comparable.
geometry = da.Geometry(**src.shape_metadata())
src.img = np.asarray(src.img) / float(geometry.integrate(src))
dst.img = np.asarray(dst.img) / float(geometry.integrate(dst))

# linear_solver="cg" keeps the example light (64^2 is small enough for
# Jacobi-CG; the MG path compiles a deeper program — see bench.py for the
# large-grid MG benchmark).
w1 = da.wasserstein_distance(
    src, dst, method="newton",
    options={"num_iter": 100, "tol_residual": 1e-6, "linear_solver": "cg"},
)
print(f"W1 (Beckmann/Newton): {float(w1):.6f}")

emd = da.EMD()
print(f"EMD (cv2):            {float(emd(src, dst)):.6f}")

# The displacement is (0.4, 0.3): |d| = 0.5 per unit mass.
print("analytic |d| = 0.5")
