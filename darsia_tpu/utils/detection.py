"""Value/color detection helpers.

Parity: reference ``src/darsia/utils/detection.py:11-139``.
"""

from __future__ import annotations

from typing import Union

import numpy as np

from .point import Coordinate, CoordinateArray, Voxel, VoxelArray, make_voxel

__all__ = [
    "detect_value",
    "detect_color",
    "orthogonal_colors",
    "monochromatic_concentration_analysis",
    "detect_closest_point",
]


def detect_value(img, value: float, tolerance: float = 0.01) -> VoxelArray:
    """Voxels where a scalar image is within tolerance of a value."""
    data = np.asarray(img.img if hasattr(img, "img") else img)
    indices = np.where(np.abs(data - value) < tolerance)
    return make_voxel(np.vstack(indices).T)


def detect_color(img, color, tolerance: float = 0.01) -> VoxelArray:
    """Voxels where an RGB image matches a color within tolerance."""
    data = np.asarray(img.img if hasattr(img, "img") else img)
    distance = np.linalg.norm(data - np.asarray(color), axis=-1)
    indices = np.where(distance < tolerance)
    return make_voxel(np.vstack(indices).T)


def orthogonal_colors(color: np.ndarray) -> np.ndarray:
    """Two colors spanning the plane orthogonal to ``color`` in RGB space."""
    color = np.asarray(color, dtype=float)
    n = color / max(np.linalg.norm(color), 1e-12)
    # Gram-Schmidt: orthogonalize two canonical axes against the color.
    candidates = np.eye(3)
    # Pick the two axes least aligned with the color.
    alignment = np.abs(candidates @ n)
    picks = np.argsort(alignment)[:2]
    basis = []
    for idx in picks:
        v = candidates[idx] - (candidates[idx] @ n) * n
        for b in basis:
            v = v - (v @ b) * b
        v = v / max(np.linalg.norm(v), 1e-12)
        basis.append(v)
    out = np.array(basis) * np.linalg.norm(color)
    # Normalize into the unit color cube.
    out = np.abs(out)
    max_per_row = np.maximum(out.max(axis=1, keepdims=True), 1e-12)
    return out / max_per_row


def monochromatic_concentration_analysis(img, color):
    """Concentration analysis projecting onto a single color direction."""
    from ..analysis.concentrationanalysis import ConcentrationAnalysis
    from ..signals.models.kernelinterpolation import KernelInterpolation
    from .kernels import LinearKernel

    ortho = orthogonal_colors(np.asarray(color))
    analysis = ConcentrationAnalysis(
        model=KernelInterpolation(
            kernel=LinearKernel(),
            supports=np.vstack((color, ortho)),
            values=[1, 0, 0],
        )
    )
    return analysis(img)


def detect_closest_point(points, target):
    """The point in ``points`` closest to ``target`` (same flavour)."""
    distances = np.linalg.norm(np.asarray(points) - np.asarray(target), axis=1)
    return points[int(np.argmin(distances))]
