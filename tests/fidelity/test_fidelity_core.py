"""Fidelity: core numerics vs the reference CPU implementation.

Same inputs through both packages; outputs must agree to tolerance
(SURVEY §7 fidelity harness).  Covers grid/FV operators, quadrature,
geometry integration, coordinate systems, and patch blending.
"""

import numpy as np
import pytest

import darsia_tpu as dt


class TestGridFidelity:
    @pytest.mark.parametrize("shape,voxel", [((4, 5), 0.25), ((3, 4, 5), [0.5, 0.25, 0.2])])
    def test_grid_layout(self, ref, shape, voxel):
        rg = ref.Grid(shape, voxel)
        og = dt.Grid(shape, voxel)
        assert rg.dim == og.dim
        assert rg.num_cells == og.num_cells
        assert rg.num_faces == og.num_faces
        assert np.allclose(rg.voxel_size, og.voxel_size)
        assert np.allclose(rg.face_vol, og.face_vol)
        assert list(rg.num_faces_per_axis) == list(og.num_faces_per_axis)

    @pytest.mark.parametrize("shape", [(4, 5), (3, 4, 5)])
    def test_fv_divergence_matrix(self, ref, shape):
        rg = ref.Grid(shape, 0.5)
        og = dt.Grid(shape, 0.5)
        rmat = ref.FVDivergence(rg).mat
        omat = dt.FVDivergence(og).mat
        assert rmat.shape == omat.shape
        assert np.max(np.abs((rmat - omat).toarray() if hasattr(rmat - omat, "toarray") else np.asarray(rmat - omat))) < 1e-12

    @pytest.mark.parametrize("lumping", [True, False])
    def test_fv_mass_matrix(self, ref, lumping):
        rg = ref.Grid((4, 5), 0.5)
        og = dt.Grid((4, 5), 0.5)
        rmat = ref.FVMass(rg, "cells", lumping).mat
        omat = dt.FVMass(og, "cells", lumping).mat
        diff = np.abs((rmat - omat).toarray())
        assert diff.max() < 1e-12

    def test_fv_face_mass_matrix(self, ref):
        rg = ref.Grid((4, 5), [0.5, 0.25])
        og = dt.Grid((4, 5), [0.5, 0.25])
        rmat = ref.FVMass(rg, "faces", True).mat
        omat = dt.FVMass(og, "faces", True).mat
        diff = np.abs((rmat - omat).toarray())
        assert diff.max() < 1e-12

    def test_fv_face_reconstruction(self, ref):
        rg = ref.Grid((6, 7), 0.25)
        og = dt.Grid((6, 7), 0.25)
        rng = np.random.default_rng(3)
        flux = rng.standard_normal(rg.num_faces)
        r_rec = ref.FVTangentialFaceReconstruction(rg)(flux)
        o_rec = dt.FVTangentialFaceReconstruction(og)(flux)
        # Internal face layouts differ (stencil vs sparse ordering): compare
        # the value multisets, which pin the averaging weights exactly.
        r_flat = np.sort(np.concatenate([np.ravel(np.asarray(p)) for p in r_rec]))
        o_flat = np.sort(np.concatenate([np.ravel(np.asarray(p)) for p in o_rec]))
        assert r_flat.shape == o_flat.shape
        assert np.allclose(r_flat, o_flat, atol=1e-12)

    def test_face_to_cell(self, ref):
        rg = ref.Grid((6, 7), 0.25)
        og = dt.Grid((6, 7), 0.25)
        rng = np.random.default_rng(4)
        flux = rng.standard_normal(rg.num_faces)
        assert np.allclose(
            np.asarray(ref.face_to_cell(rg, flux)),
            np.asarray(dt.face_to_cell(og, flux)),
            atol=1e-12,
        )


class TestQuadratureFidelity:
    @pytest.mark.parametrize("dim", [1, 2, 3])
    @pytest.mark.parametrize("order", [0, 1, 2, 3])
    def test_gauss_rules(self, ref, dim, order):
        # Rules may use different (equally valid) node sets; fidelity is
        # polynomial exactness: identical integrals for degree<=order.
        try:
            rpts, rw = ref.quadrature.gauss(dim, order)
        except NotImplementedError:
            # darsia_tpu supports higher orders than the reference
            # (ref utils/quadrature.py:315 raises for these combos).
            dt.quadrature.gauss(dim, order)
            return
        opts, ow = dt.quadrature.gauss(dim, order)
        # Our rule must weigh up to the cell volume |[-1,1]^dim| exactly.
        assert np.isclose(np.sum(ow), 2.0**dim, atol=1e-10)
        rng = np.random.default_rng(dim * 10 + order)
        coeff = rng.standard_normal(dim)

        def poly(p):
            p = np.atleast_2d(p)
            return sum(coeff[d] * p[:, d] ** order for d in range(dim))

        o_int = np.sum(ow * poly(opts))
        if np.isclose(np.sum(rw), 2.0**dim, atol=1e-10):
            r_int = np.sum(rw * poly(rpts))
            assert np.isclose(r_int, o_int, atol=1e-10)
        else:
            # Upstream rule is mis-normalized for this combo (e.g. ref
            # gauss(2,3) weights sum to 8 != 4; gauss(3,1) drops a tensor
            # point, summing 7 != 8). Verify ours analytically instead:
            # Gauss-Legendre integrates x^order exactly on [-1,1].
            exact = sum(
                coeff[d] * (2.0 ** (dim - 1)) * ((1 - (-1) ** (order + 1)) / (order + 1))
                for d in range(dim)
            )
            assert np.isclose(o_int, exact, atol=1e-10)

    @pytest.mark.parametrize("dim", [1, 2, 3])
    def test_reference_cell_corners(self, ref, dim):
        r_out = ref.quadrature.reference_cell_corners(dim)
        o_out = dt.quadrature.reference_cell_corners(dim)
        r_corners = np.asarray(r_out[0] if isinstance(r_out, tuple) else r_out)
        o_corners = np.asarray(o_out[0] if isinstance(o_out, tuple) else o_out)
        # Same corner set (order-independent).
        r_sorted = r_corners[np.lexsort(r_corners.T[::-1])]
        o_sorted = o_corners[np.lexsort(o_corners.T[::-1])]
        assert np.allclose(r_sorted, o_sorted, atol=1e-12)
        if isinstance(r_out, tuple) and isinstance(o_out, tuple):
            assert np.isclose(np.sum(r_out[1]), np.sum(o_out[1]), atol=1e-12)


class TestGeometryFidelity:
    def test_integrate_matches(self, ref):
        rng = np.random.default_rng(5)
        data = rng.random((12, 17))
        r_img = ref.Image(data.copy(), width=2.0, height=1.5, scalar=True)
        o_img = dt.Image(data.copy(), width=2.0, height=1.5, scalar=True)
        r_geom = ref.Geometry(**r_img.shape_metadata())
        o_geom = dt.Geometry(**o_img.shape_metadata())
        assert np.isclose(
            float(r_geom.integrate(r_img)), float(o_geom.integrate(o_img)), rtol=1e-10
        )

    def test_porous_geometry(self, ref):
        rng = np.random.default_rng(6)
        data = rng.random((10, 8))
        porosity = 0.2 + 0.6 * rng.random((10, 8))
        r_img = ref.Image(data.copy(), width=1.0, height=1.0, scalar=True)
        o_img = dt.Image(data.copy(), width=1.0, height=1.0, scalar=True)
        r_geom = ref.PorousGeometry(porosity.copy(), **r_img.shape_metadata())
        o_geom = dt.PorousGeometry(porosity.copy(), **o_img.shape_metadata())
        assert np.isclose(
            float(r_geom.integrate(r_img)), float(o_geom.integrate(o_img)), rtol=1e-8
        )

    def test_extruded_geometry(self, ref):
        rng = np.random.default_rng(7)
        data = rng.random((10, 8))
        depth = 0.01 + 0.02 * rng.random((10, 8))
        r_img = ref.Image(data.copy(), width=1.0, height=1.0, scalar=True)
        o_img = dt.Image(data.copy(), width=1.0, height=1.0, scalar=True)
        r_geom = ref.ExtrudedGeometry(depth.copy(), **r_img.shape_metadata())
        o_geom = dt.ExtrudedGeometry(depth.copy(), **o_img.shape_metadata())
        assert np.isclose(
            float(r_geom.integrate(r_img)), float(o_geom.integrate(o_img)), rtol=1e-8
        )


class TestCoordinateSystemFidelity:
    def test_voxel_coordinate_roundtrip(self, ref):
        rng = np.random.default_rng(8)
        data = rng.random((20, 30))
        r_img = ref.Image(
            data.copy(), width=3.0, height=2.0, origin=[0.5, 2.5], scalar=True
        )
        o_img = dt.Image(
            data.copy(), width=3.0, height=2.0, origin=[0.5, 2.5], scalar=True
        )
        voxels = np.array([[0, 0], [19, 29], [7, 13]])
        r_coords = np.array([r_img.coordinatesystem.coordinate(v) for v in voxels])
        o_coords = np.array([o_img.coordinatesystem.coordinate(v) for v in voxels])
        assert np.allclose(r_coords, o_coords, atol=1e-12)
        r_back = np.array([r_img.coordinatesystem.voxel(c) for c in r_coords])
        o_back = np.array([o_img.coordinatesystem.voxel(c) for c in o_coords])
        assert np.array_equal(r_back, o_back)

    def test_coordinate_vector(self, ref):
        data = np.zeros((10, 12))
        r_img = ref.Image(data.copy(), width=2.0, height=1.0, scalar=True)
        o_img = dt.Image(data.copy(), width=2.0, height=1.0, scalar=True)
        vec = np.array([[1, 2], [3, 4]])
        assert np.allclose(
            np.asarray(r_img.coordinatesystem.coordinate_vector(vec)),
            np.asarray(o_img.coordinatesystem.coordinate_vector(vec)),
            atol=1e-12,
        )


class TestPatchesFidelity:
    def test_assemble_roundtrip_matches(self, ref):
        rng = np.random.default_rng(9)
        data = rng.random((40, 60, 3)).astype(np.float64)
        r_img = ref.Image(data.copy(), width=1.5, height=1.0)
        o_img = dt.Image(data.copy(), width=1.5, height=1.0)
        r_patches = ref.Patches(r_img, [4, 5], rel_overlap=0.2)
        o_patches = dt.Patches(o_img, [4, 5], rel_overlap=0.2)
        r_asm = r_patches.assemble()
        o_asm = o_patches.assemble()
        assert np.allclose(np.asarray(r_asm.img), np.asarray(o_asm.img), atol=1e-10)
        # Reassembly must reproduce the original.
        assert np.allclose(np.asarray(o_asm.img), data, atol=1e-10)

    def test_blend_and_assemble_partition_of_unity(self, ref):
        # The reference's blend_and_assemble path is broken upstream
        # (`_prepare_weights` reads `self.pw`/`self.ph` which are never
        # assigned, reference image/patches.py:357-360), so no direct
        # comparison is possible. Fidelity here is the documented contract
        # (partition-of-unity blending, reference patches.py:553-565):
        # untouched patches must blend back to the original image.
        rng = np.random.default_rng(10)
        data = rng.random((40, 60)).astype(np.float64)
        o_img = dt.Image(data.copy(), width=1.5, height=1.0, scalar=True)
        o_patches = dt.Patches(o_img, [4, 5], rel_overlap=0.25)
        o_blend = o_patches.blend_and_assemble()
        assert np.allclose(np.asarray(o_blend.img), data, atol=1e-8)
