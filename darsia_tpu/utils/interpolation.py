"""Scattered-data interpolation onto physical images.

Parity: reference ``src/darsia/utils/interpolation.py:16-310``.

TPU-first deviations: polynomial fits use the closed-form LS solve of the
design matrix (the reference runs iterative ``least_squares`` on a linear
problem); RBF interpolation is a dense thin-plate-spline solve + one matmul
evaluation over all voxel coordinates — MXU-shaped work, jittable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rbf_interpolate",
    "polynomial_design_matrix",
    "interpolate_measurements_2d",
    "polynomial_interpolation",
    "illumination_interpolation",
    "interpolate_to_image",
    "interpolate_to_image_from_csv",
]


def _tps_kernel(r: jnp.ndarray) -> jnp.ndarray:
    """Thin-plate spline kernel r^2 log r (scipy RBFInterpolator default)."""
    safe = jnp.where(r > 0, r, 1.0)
    return jnp.where(r > 0, r * r * jnp.log(safe), 0.0)


def rbf_interpolate(
    points: np.ndarray,
    values: np.ndarray,
    query: jnp.ndarray,
    smoothing: float = 0.0,
) -> jnp.ndarray:
    """Thin-plate-spline RBF interpolation (dense solve + matmul eval).

    Args:
        points: (N, 2) sample locations.
        values: (N,) sample values.
        query: (M, 2) evaluation locations.
        smoothing: Tikhonov smoothing on the kernel diagonal.

    """
    P = jnp.asarray(points, dtype=jnp.float32)
    v = jnp.asarray(values, dtype=P.dtype)
    n = P.shape[0]
    # Kernel matrix + linear polynomial tail (1, x, y).
    dists = jnp.linalg.norm(P[:, None, :] - P[None, :, :], axis=-1)
    K = _tps_kernel(dists) + smoothing * jnp.eye(n, dtype=P.dtype)
    poly = jnp.concatenate([jnp.ones((n, 1), dtype=P.dtype), P], axis=1)
    A = jnp.block(
        [[K, poly], [poly.T, jnp.zeros((3, 3), dtype=P.dtype)]]
    )
    rhs = jnp.concatenate([v, jnp.zeros(3, dtype=P.dtype)])
    sol = jnp.linalg.solve(A, rhs)
    w, c = sol[:n], sol[n:]

    # Chunked evaluation with the matmul distance trick — avoids
    # materializing a (num_query, num_centers, 2) broadcast (an HBM blowup
    # for megapixel queries).
    Q = jnp.asarray(query, dtype=P.dtype)
    p_sq = jnp.sum(P * P, axis=-1)[None, :]

    def eval_block(Qb):
        q_sq = jnp.sum(Qb * Qb, axis=-1, keepdims=True)
        cross = jnp.matmul(Qb, P.T, precision="highest")
        d2 = jnp.maximum(q_sq - 2.0 * cross + p_sq, 0.0)
        r = jnp.sqrt(d2)
        return _tps_kernel(r) @ w + c[0] + Qb @ c[1:]

    m = Q.shape[0]
    block = 1 << 18  # 256k queries per block
    if m <= block:
        return eval_block(Q)
    num_blocks = -(-m // block)
    padded = jnp.pad(Q, ((0, num_blocks * block - m), (0, 0)))
    blocks = padded.reshape(num_blocks, block, Q.shape[1])
    out = jax.lax.map(eval_block, blocks)
    return out.reshape(-1)[:m]


def polynomial_design_matrix(coords: np.ndarray, degree: int) -> np.ndarray:
    """Monomial design matrix x^i y^j for i+j <= degree."""
    coords = np.asarray(coords, dtype=float)
    cols = []
    for i in range(degree + 1):
        for j in range(degree + 1):
            if i + j <= degree:
                cols.append(coords[:, 0] ** i * coords[:, 1] ** j)
    return np.stack(cols, axis=1)


def interpolate_measurements_2d(measurements, coordinate_system) -> np.ndarray:
    """RBF-interpolate (x, y, values) measurements onto a voxel grid."""
    assert len(measurements) == 3
    points = np.stack([measurements[0], measurements[1]], axis=1)
    coords = np.asarray(coordinate_system.coordinates, dtype=float)
    Ny, Nx = coordinate_system.shape[:2]
    out = np.asarray(rbf_interpolate(points, measurements[2], jnp.asarray(coords)))
    return out.reshape(coordinate_system.shape, order="F")


def polynomial_interpolation(
    measurements, coordinate_system, degree: int = 2
) -> np.ndarray:
    """Least-squares polynomial fit of measurements, evaluated on the grid.

    The degree is capped so the fit stays overdetermined (an underdetermined
    min-norm solution interpolates the samples but oscillates in between).
    """
    points = np.stack([measurements[0], measurements[1]], axis=1)
    while degree > 0 and (degree + 1) * (degree + 2) // 2 > points.shape[0]:
        degree -= 1
    X = polynomial_design_matrix(points, degree)
    coeffs, *_ = np.linalg.lstsq(X, np.asarray(measurements[2], dtype=float), rcond=None)
    coords = np.asarray(coordinate_system.coordinates, dtype=float)
    Xq = polynomial_design_matrix(coords, degree)
    return (Xq @ coeffs).reshape(coordinate_system.shape, order="F")


def illumination_interpolation(measurements, coordinate_system) -> np.ndarray:
    """Point-source illumination model fit: I0 / dist(p, source)^p."""
    from scipy.optimize import least_squares

    points = np.stack([measurements[0], measurements[1]], axis=1)
    data = np.asarray(measurements[2], dtype=float)

    def model(coeffs, coords):
        dist = (
            np.sqrt(
                (coords[:, 0] - coeffs[0]) ** 2
                + (coords[:, 1] - coeffs[1]) ** 2
                + coeffs[2] ** 2
            )
            ** coeffs[4]
        )
        return coeffs[3] / dist

    result = least_squares(
        lambda c: model(c, points) - data, np.ones(5)
    )
    coords = np.asarray(coordinate_system.coordinates, dtype=float)
    return model(result.x, coords).reshape(coordinate_system.shape, order="F")


def interpolate_to_image(
    data,
    image,
    method: Literal[
        "rbf", "illumination", "linear", "quadratic", "cubic", "quartic"
    ] = "rbf",
):
    """Interpolate scattered (x, y, value) data onto an image's voxel grid."""
    interpolated = image.copy()
    assert len(data) == 3, "Data must be a tuple of (x, y, data)."
    if all(np.asarray(d).ndim == 2 for d in data):
        data = tuple(np.ravel(d) for d in data)

    cs = interpolated.coordinatesystem
    if method.lower() == "rbf":
        interpolated.img = interpolate_measurements_2d(data, cs)
    elif method.lower() == "illumination":
        interpolated.img = illumination_interpolation(data, cs)
    elif method.lower() in ("linear", "quadratic", "cubic", "quartic"):
        degree = {"linear": 1, "quadratic": 2, "cubic": 3, "quartic": 4}[
            method.lower()
        ]
        interpolated.img = polynomial_interpolation(data, cs, degree)
    else:
        raise NotImplementedError(f"Interpolation method {method!r} not supported.")
    return interpolated


def interpolate_to_image_from_csv(csv_file: Path, key: str, image, method="rbf"):
    """Interpolate measurement columns of a CSV file onto an image."""
    import pandas as pd

    data = pd.read_csv(csv_file)
    x_key = "x" if "x" in data.columns else "X"
    y_key = "y" if "y" in data.columns else "Y"
    return interpolate_to_image(
        (data[x_key].to_numpy(), data[y_key].to_numpy(), data[key].to_numpy()),
        image,
        method=method,
    )
