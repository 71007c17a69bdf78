"""Wasserstein error against the analytical two-block solution.

Mirrors reference ``tests/unit/test_wasserstein_error.py``: translating a
square block of mass has the closed-form W1 distance
``|displacement| * block_mass``; the discrete Beckmann solve must approach
it under grid refinement.
"""

from __future__ import annotations

import numpy as np
import pytest

import darsia_tpu as da

# Blocks as (x_center, y_center, half_width) on the unit square.
BLOCK_1 = (0.25, 0.5, 0.125)
BLOCK_2 = (0.75, 0.5, 0.125)


def _analytic_distance(block1, block2) -> float:
    dx = block2[0] - block1[0]
    dy = block2[1] - block1[1]
    return float(np.hypot(dx, dy) * (2 * block1[2]) ** 2)


def _block_mass(shape, voxel_size, block) -> np.ndarray:
    """Indicator of the block on the cell-centered grid (unit density)."""
    rows, cols = shape
    y = voxel_size * (0.5 + np.arange(rows - 1, -1, -1))  # row 0 = top
    x = voxel_size * (0.5 + np.arange(cols))
    yy, xx = np.meshgrid(y, x, indexing="ij")
    inside = (np.abs(xx - block[0]) < block[2]) & (
        np.abs(yy - block[1]) < block[2]
    )
    return inside.astype(float)


def _distance(factor: int) -> float:
    shape = (8 * factor, 8 * factor)
    voxel_size = 1.0 / (8 * factor)
    src = _block_mass(shape, voxel_size, BLOCK_1)
    dst = _block_mass(shape, voxel_size, BLOCK_2)
    meta = {"width": 1.0, "height": 1.0, "scalar": True}
    src_img = da.Image(src, **meta)
    dst_img = da.Image(dst, **meta)
    return float(
        da.wasserstein_distance(
            src_img,
            dst_img,
            method="newton",
            options={
                "num_iter": 400,
                "L": 1e9,
                "tol_increment": 1e-6,
                "tol_distance": 1e-6,
                "aa_depth": 5,
            },
        )
    )


class TestAnalyticTwoBlocks:
    def test_matches_analytic(self):
        """At moderate resolution the discrete distance is within a few
        percent of the closed form (pure-translation transport aligns
        with the grid, so TPFA resolves it quickly)."""
        exact = _analytic_distance(BLOCK_1, BLOCK_2)
        approx = _distance(4)  # 32x32
        assert np.isclose(approx, exact, rtol=3e-2), (approx, exact)

    def test_refinement_converges(self):
        """The error decreases under refinement."""
        exact = _analytic_distance(BLOCK_1, BLOCK_2)
        errors = [abs(_distance(f) - exact) / exact for f in (2, 4, 8)]
        assert errors[-1] < errors[0]
        assert errors[-1] < 2e-2, errors

    def test_diagonal_translation(self):
        """Off-axis displacement (exercises both flux components)."""
        block2 = (0.625, 0.75, 0.125)
        exact = _analytic_distance(BLOCK_1, block2)
        shape = (32, 32)
        voxel_size = 1.0 / 32
        src = _block_mass(shape, voxel_size, BLOCK_1)
        dst = _block_mass(shape, voxel_size, block2)
        meta = {"width": 1.0, "height": 1.0, "scalar": True}
        approx = float(
            da.wasserstein_distance(
                da.Image(src, **meta),
                da.Image(dst, **meta),
                method="newton",
                options={
                    "num_iter": 600,
                    "L": 1e9,
                    "tol_increment": 1e-6,
                    "tol_distance": 1e-6,
                    "aa_depth": 5,
                },
            )
        )
        # Diagonal transport is not grid-aligned: W1 discretizes at a few
        # percent on 32^2 (the reference observes the same behavior).
        assert np.isclose(approx, exact, rtol=6e-2), (approx, exact)
