"""Quadrature rules: polynomial exactness + reference-value parity.

Reference: `/root/reference/src/darsia/utils/quadrature.py` (tabulated
Gauss rules for orders 0-4 in 1-3d); our rules are generated for arbitrary
order and must (a) reproduce the tabulated constants, (b) integrate
polynomials of the advertised degree exactly, including on faces.
"""

import numpy as np
import pytest

from darsia_tpu.utils.quadrature import (
    gauss,
    gauss_reference_cell,
    gauss_reference_face,
    reference_cell_corners,
)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 6])
@pytest.mark.parametrize("dim", [1, 2, 3])
def test_polynomial_exactness(dim, order):
    """A rule of order p integrates x^k (k <= 2p+1 per axis) exactly."""
    pts, weights = gauss_reference_cell(dim, order)
    pts = np.atleast_2d(pts).reshape(-1, dim)
    # Gauss with p+1 points is exact through degree 2p+1.
    for degree in range(0, 2 * order + 2):
        approx = float(np.sum(weights * pts[:, 0] ** degree))
        exact = 1.0 / (degree + 1)  # integral of x^d over [0,1], mean weight
        assert approx == pytest.approx(exact, abs=1e-12)


def test_matches_reference_tabulated_constants():
    """Generated 1d rules equal the reference's hand-tabulated ones."""
    pts, w = gauss(1, 1)
    np.testing.assert_allclose(
        np.sort(pts), [-1 / np.sqrt(3), 1 / np.sqrt(3)], atol=1e-14
    )
    np.testing.assert_allclose(w, [1.0, 1.0], atol=1e-14)
    pts2, w2 = gauss(1, 2)
    np.testing.assert_allclose(
        np.sort(pts2), [-np.sqrt(3 / 5), 0.0, np.sqrt(3 / 5)], atol=1e-14
    )
    np.testing.assert_allclose(
        np.sort(w2), np.sort([5 / 9, 8 / 9, 5 / 9]), atol=1e-14
    )
    # "max" order mapping matches the reference (4/3/2 for 1/2/3 d).
    assert gauss(1, "max")[0].shape[0] == 5
    assert gauss(2, "max")[0].shape[0] == 16
    assert gauss(3, "max")[0].shape[0] == 27


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("axis", [0, 1])
def test_face_quadrature(dim, axis):
    if axis >= dim:
        pytest.skip("axis out of range")
    for side in (0, 1):
        pts, weights = gauss_reference_face(dim, axis, side, order=2)
        assert pts.shape[1] == dim
        np.testing.assert_allclose(pts[:, axis], float(side))
        assert weights.sum() == pytest.approx(1.0)
        if dim > 1:
            # Exact integration of a quadratic over the face.
            other = [d for d in range(dim) if d != axis][0]
            approx = float(np.sum(weights * pts[:, other] ** 2))
            assert approx == pytest.approx(1.0 / 3.0, abs=1e-12)


def test_reference_cell_corners_ordering():
    corners2, w2 = reference_cell_corners(2)
    np.testing.assert_array_equal(
        corners2, [[0, 0], [1, 0], [1, 1], [0, 1]]
    )
    assert w2.sum() == pytest.approx(1.0)
    corners3, w3 = reference_cell_corners(3)
    assert corners3.shape == (8, 3)
    assert w3.sum() == pytest.approx(1.0)
