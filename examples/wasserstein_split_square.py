"""Wasserstein computation moving a square to another location.

Mirrors reference examples/wasserstein_split_square.py: the 10x10 anchor
problem (exact distance 0.379543951823), refined 2^4x to a 160x160 grid,
solved with the Newton Beckmann solver (MG-preconditioned TPFA).
"""

import time

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as darsia

# Coarse src image
rows = cols = 10
src_square = np.zeros((rows, cols), dtype=float)
src_square[2:5, 2:5] = 1
meta = {"width": 1, "height": 1, "space_dim": 2, "scalar": True}
src_image = darsia.Image(src_square, **meta)

# Coarse dst image
dst_squares = np.zeros((rows, cols), dtype=float)
dst_squares[1:3, 1:2] = 1
dst_squares[4:7, 7:9] = 1
dst_image = darsia.Image(dst_squares, **meta)

# Rescale to unit mass
geometry = darsia.Geometry(**src_image.shape_metadata())
src_image.img = np.asarray(src_image.img) / geometry.integrate(src_image)
dst_image.img = np.asarray(dst_image.img) / geometry.integrate(dst_image)

# Refine 2^4x -> 160x160 (conservative nearest refinement); fast mode
# (integration suite) stops one level earlier.
lvl = 3 if _data.fast_mode() else 4
resize = darsia.Resize(
    **{
        "resize shape": (rows * 2**lvl, cols * 2**lvl),
        "resize interpolation": "inter_nearest",
    }
)
src_image = resize(src_image)
dst_image = resize(dst_image)

options = {
    "num_iter": 200,
    "tol_residual": 1e-3,
    "tol_increment": 1e-3,
    "tol_distance": 1e-3,
    "L": 1e9,
    "return_info": True,
}
tic = time.time()
distance, info = darsia.wasserstein_distance(
    src_image, dst_image, method="newton", options=options
)
elapsed = time.time() - tic
print(
    f"W1 (newton, 160x160): {float(distance):.6f} "
    f"(coarse-grid reference 0.379544) in {elapsed:.2f}s, "
    f"{info['number_iterations'] + 1} iterations"
)
assert abs(float(distance) - 0.379543951823) < 0.02
