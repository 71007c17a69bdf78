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
    gauss_lobatto,
    gauss_reference_boundary,
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


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
@pytest.mark.parametrize("dim", [1, 2])
def test_gauss_lobatto_exactness(dim, order):
    """Lobatto order p (p+2 points/axis) is exact through degree 2p+1 and
    includes the interval endpoints."""
    pts, weights = gauss_lobatto(dim, order)
    pts = np.atleast_2d(pts.reshape(-1, dim) if pts.ndim > 1 else pts[:, None])
    x = pts[:, 0]
    assert x.min() == pytest.approx(-1.0) and x.max() == pytest.approx(1.0)
    for degree in range(0, 2 * order + 2):
        approx = float(np.sum(weights * x**degree))
        exact = (1 - (-1) ** (degree + 1)) / (degree + 1) * 2 ** (dim - 1)
        assert approx == pytest.approx(exact, abs=1e-10)


@pytest.mark.parametrize("order", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("dim", [2, 3])
def test_boundary_quadrature_exactness(dim, order):
    """The all-faces rule integrates polynomials exactly over the unit-cube
    boundary (normalized: weights sum to 1 = boundary mean)."""
    pts, weights = gauss_reference_boundary(dim, order)
    assert pts.shape == (weights.shape[0], dim)
    assert weights.sum() == pytest.approx(1.0)
    # Boundary mean of x_0^2 on [0,1]^dim: two faces have x_0 fixed at 0/1
    # (mean 1/2), the remaining 2(dim-1) faces integrate x^2 (mean 1/3).
    approx = float(np.sum(weights * pts[:, 0] ** 2))
    exact = (0.0 + 1.0 + 2 * (dim - 1) / 3.0) / (2 * dim)
    assert approx == pytest.approx(exact, abs=1e-12)


def test_beckmann_face_quadrature_mode():
    """FACE_QUADRATURE L1 mode + arbitrary l1_order run the anchor problem
    and stay within quadrature-error distance of the RT0 cell rule."""
    import darsia_tpu as da

    src = np.zeros((10, 10))
    dst = np.zeros((10, 10))
    src[2:5, 2:5] = 1
    dst[1:3, 1:2] = 1
    dst[4:7, 7:9] = 1
    meta = {"width": 1, "height": 1, "scalar": True}
    src_i, dst_i = da.Image(src, **meta), da.Image(dst, **meta)
    geometry = da.Geometry(**src_i.shape_metadata())
    src_i.img = np.asarray(src_i.img) / geometry.integrate(src_i)
    dst_i.img = np.asarray(dst_i.img) / geometry.integrate(dst_i)
    opts = {
        "num_iter": 400,
        "L": 1e9,
        "tol_residual": 1e-3,
        "tol_increment": 1e-3,
        "tol_distance": 1e-3,
    }
    d_rt0 = da.wasserstein_distance(src_i, dst_i, method="newton", options=opts)
    d_face = da.wasserstein_distance(
        src_i,
        dst_i,
        method="newton",
        options={**opts, "l1_mode": "face_quadrature", "l1_order": 3},
    )
    assert d_face == pytest.approx(d_rt0, rel=0.05)
    assert d_face == pytest.approx(0.379543951823, rel=0.05)


def test_reference_cell_corners_ordering():
    corners2, w2 = reference_cell_corners(2)
    np.testing.assert_array_equal(
        corners2, [[0, 0], [1, 0], [1, 1], [0, 1]]
    )
    assert w2.sum() == pytest.approx(1.0)
    corners3, w3 = reference_cell_corners(3)
    assert corners3.shape == (8, 3)
    assert w3.sum() == pytest.approx(1.0)
