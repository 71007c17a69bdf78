"""Seventh API-surface cluster: second method-level parity batch from the
namespace/method audit — registration output helpers, patchwise-illumination
seams, relative-color sample front-ends, Beckmann representation views,
mass-result aliases, multiphase/simple-run contour plots, label-map helpers,
multi-contour plotting, and MG level-wise building blocks."""

import numpy as np
import pytest

import darsia_tpu as da


# --------------------------------------------------------------- registration


def _textured(seed, shape=(96, 128)):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.2, 0.8, size=(shape[0] // 8, shape[1] // 8))
    img = np.kron(base, np.ones((8, 8)))
    return img.astype(np.float32)


def test_diffeomorphic_registration_call_with_output():
    base_arr = _textured(11)
    shifted_arr = np.roll(base_arr, shift=(2, -3), axis=(0, 1))
    base = da.ScalarImage(base_arr, width=1.0, height=1.0)
    img = da.ScalarImage(shifted_arr, width=1.0, height=1.0)

    reg = da.DiffeomorphicImageRegistration(
        base, N_patches=[3, 3], rel_overlap=0.3, quality_tol=0.01
    )
    transformed, patch_translation = reg.call_with_output(
        img, return_patch_translation=True
    )
    assert transformed.img.shape == base_arr.shape
    patch_translation = np.asarray(patch_translation)
    assert patch_translation.shape == (3, 3, 2)
    assert np.isfinite(patch_translation).all()

    field = reg.displacement()
    assert field.shape == (2, 96, 128)
    assert np.isfinite(field).all()


# ----------------------------------------------------- patchwise illumination


def test_patchwise_illumination_seam_methods():
    rng = np.random.default_rng(3)
    img = rng.uniform(0.2, 0.9, size=(40, 30, 3)).astype(np.float32)
    corr = da.PatchwiseIlluminationCorrection(
        image=img, baseline_images=[img], nw=6, limit=16
    )
    red, green, blue = corr.extract_color_values_patches(img, full=False)
    assert red.shape == green.shape == blue.shape == (corr.nh, corr.nw)
    # channel split matches the internal patch-mean kernel
    means = np.asarray(corr._patch_means(img, full=False))
    np.testing.assert_allclose(red, means[..., 0])
    np.testing.assert_allclose(blue, means[..., 2])

    lower = np.ones((corr.nh, corr.nw, 3), np.float32)
    extended = corr.extend_correction_coefficients(lower)
    assert extended.shape[0] > corr.nh  # top band was filled in
    assert extended.shape[1:] == (corr.nw, 3)
    np.testing.assert_allclose(extended, 1.0, atol=1e-6)


# ------------------------------------------------------ relative color seams


class TestRelativeColorSampling:
    def _image(self, seed=5):
        rng = np.random.default_rng(seed)
        arr = rng.uniform(0.1, 0.9, size=(48, 64, 3)).astype(np.float32)
        return da.OpticalImage(arr, width=1.0, height=0.75)

    def test_define_similar_colors_headless(self):
        img = self._image()
        corr = da.RelativeColorCorrection(
            baseline=img, images=[img], config={"degree": 1}
        )
        samples = [
            (slice(4, 12), slice(4, 12)),
            (slice(30, 40), slice(40, 56)),
        ]
        corr.define_similar_colors(samples_per_image=[samples])
        assert len(corr.data) == 1
        coords, colors = corr.data[0]
        assert coords.shape == (2, 2) and colors.shape == (2, 3)
        # coordinates are physical (within the 1.0 x 0.75 domain)
        assert coords[:, 0].max() <= 1.0 and coords[:, 1].max() <= 0.75

        corr.define_reference_color(samples=samples)
        assert len(corr.reference_data) == 1
        assert corr.reference_data[0].shape == (3,)

        # end-to-end: calibrate + setup + apply stays finite
        corr.calibrate()
        corr.setup()
        out = corr(img)
        assert np.isfinite(np.asarray(out.img)).all()

    def test_define_tensorial(self):
        img = self._image(7)
        corr = da.RelativeColorCorrection(
            baseline=img, images=[img], config={"degree": 1}
        )
        reference_samples = [
            (slice(2, 10), slice(2, 10)),
            (slice(2, 10), slice(14, 22)),
        ]
        location_samples = [
            (slice(8, 16), slice(8, 16)),
            (slice(30, 38), slice(40, 48)),
        ]
        corr.define_similar_and_reference_colors_tensorial(
            reference_samples=reference_samples,
            location_samples=location_samples,
        )
        # one (coords, colors) group + one reference per reference sample
        assert len(corr.data) == 2
        assert len(corr.reference_data) == 2
        for coords, colors in corr.data:
            assert coords.shape == (2, 2) and colors.shape == (2, 3)


# ---------------------------------------------------- Beckmann representation


class TestBeckmannViews:
    def setup_method(self):
        self.grid = da.Grid((6, 5), [0.5, 0.4])
        self.problem = da.BeckmannProblem(self.grid)

    def test_ndofs_and_view_roundtrip(self):
        problem = self.problem
        num_faces = sum(
            int(np.prod(s)) for s in self.grid.faces_shape
        )
        assert problem.ndofs == num_faces + 30

        rng = np.random.default_rng(0)
        fluxes = tuple(
            rng.normal(size=s).astype(np.float32)
            for s in self.grid.faces_shape
        )
        pressure = rng.normal(size=(6, 5)).astype(np.float32)
        flat = problem.flat_view(fluxes, pressure)
        assert flat.shape == (problem.ndofs,)
        back_fluxes = problem.flux_view(flat)
        back_pressure = problem.pressure_view(flat)
        for f, b in zip(fluxes, back_fluxes):
            np.testing.assert_allclose(np.asarray(b), f, atol=1e-7)
        np.testing.assert_allclose(np.asarray(back_pressure), pressure, atol=1e-7)

    def test_transport_density_faces_and_cell_weighted_flux(self):
        rng = np.random.default_rng(1)
        fluxes = tuple(
            rng.normal(size=s).astype(np.float32)
            for s in self.grid.faces_shape
        )
        faces = self.problem.transport_density_faces(fluxes)
        for f, mag in zip(fluxes, faces):
            np.testing.assert_allclose(np.asarray(mag), np.abs(f), atol=1e-7)
        cell = self.problem.cell_weighted_flux(fluxes)
        assert cell.shape == (6, 5)
        assert np.isfinite(np.asarray(cell)).all()
        assert float(np.asarray(cell).min()) >= 0.0

    def test_optimality_conditions(self):
        problem = self.problem
        fluxes = problem.zero_fluxes()
        rhs = np.zeros((6, 5), np.float32)
        rhs[0, 0], rhs[-1, -1] = 1.0, -1.0
        res = problem.optimality_conditions(
            fluxes, np.zeros((6, 5), np.float32), rhs
        )
        assert np.isfinite(float(np.asarray(res).max()))
        # reference name is an exact alias
        assert (
            BeckmannAlias := problem.rescaled_flux_optimality_conditions
        ).__func__ is problem.optimality_conditions.__func__
        assert BeckmannAlias is not None


class TestBeckmannSolverSeams:
    """Effective-quantity and Poisson seams on the solver subclasses."""

    def _grid(self):
        return da.Grid((10, 10), 0.1)

    def _images(self):
        src = np.zeros((10, 10))
        src[2:5, 2:5] = 1
        dst = np.zeros((10, 10))
        dst[6:9, 6:9] = 1
        meta = {"width": 1, "height": 1, "scalar": True}
        return (
            da.Image(src / src.sum() * 100, **meta),
            da.Image(dst / dst.sum() * 100, **meta),
        )

    def test_distance_matrix(self):
        from darsia_tpu.measure.beckmann import BeckmannNewtonSolver

        newton = BeckmannNewtonSolver(
            self._grid(),
            options={"num_iter": 200, "tol_residual": 1e-3, "return_info": True},
        )
        a, b = self._images()
        m = newton.distance_matrix([a, b, a.copy()])
        assert m.shape == (3, 3)
        assert np.allclose(m, m.T) and np.allclose(np.diag(m), 0.0)
        assert m[0, 1] > 0 and m[0, 2] == pytest.approx(0.0, abs=1e-10)
        # return_info option is restored after the matrix loop
        assert newton.options.get("return_info") is True

    def test_newton_residual_and_jacobian(self):
        from darsia_tpu.measure.beckmann import BeckmannNewtonSolver

        grid = self._grid()
        newton = BeckmannNewtonSolver(grid)
        rng = np.random.default_rng(0)
        fluxes = tuple(
            rng.normal(size=s).astype(np.float32) for s in grid.faces_shape
        )
        p = rng.normal(size=(10, 10)).astype(np.float32)
        res = np.asarray(
            newton.compute_residual(fluxes, p, np.zeros((10, 10), np.float32))
        )
        assert res.shape == (newton.ndofs,)
        assert np.isfinite(res).all()
        # the pressure block is exactly div(u)
        from darsia_tpu.measure import beckmann_kernels as bk

        div = np.asarray(bk.face_divergence(fluxes, newton.face_vol, 2))
        np.testing.assert_allclose(
            np.asarray(newton.pressure_view(res)), div, atol=1e-6
        )
        # Jacobian operator is symmetric
        J = newton.compute_jacobian(fluxes)
        x = rng.normal(size=(10, 10)).astype(np.float32)
        y = rng.normal(size=(10, 10)).astype(np.float32)
        assert float(np.sum(np.asarray(J(x)) * y)) == pytest.approx(
            float(np.sum(x * np.asarray(J(y)))), rel=1e-4
        )

    def test_gprox_poisson_and_leray(self):
        from darsia_tpu.measure import beckmann_kernels as bk
        from darsia_tpu.measure.beckmann import BeckmannGproxPGHDSolver

        grid = self._grid()
        gp = BeckmannGproxPGHDSolver(grid)
        assert set(gp.amg_options) == {
            "levels",
            "presmoother_iterations",
            "coarse_iterations",
        }
        rng = np.random.default_rng(1)
        solver = gp.setup_poisson_solver(rtol=1e-8)
        rhs = rng.normal(size=(10, 10)).astype(np.float32)
        sol = np.asarray(solver.solve(rhs))
        trans = gp.transmissibilities(tuple(gp.base_face_weights))
        applied = np.asarray(bk.tpfa_apply(sol, trans, 2))
        projected = rhs - rhs.mean()
        assert np.linalg.norm(applied - projected) < 1e-4 * np.linalg.norm(
            projected
        )
        solver.kill()  # parity no-op

        fluxes = tuple(
            rng.normal(size=s).astype(np.float32) for s in grid.faces_shape
        )
        proj = gp.leray_projection(fluxes)
        div0 = np.asarray(bk.face_divergence(fluxes, gp.face_vol, 2))
        div1 = np.asarray(bk.face_divergence(proj, gp.face_vol, 2))
        assert np.linalg.norm(div1 - div1.mean()) < 1e-4 * np.linalg.norm(
            div0 - div0.mean()
        )

    def test_gprox_effective_quantities(self):
        from darsia_tpu.measure.beckmann import (
            BeckmannGproxPGHDSolver,
            BeckmannNewtonSolver,
        )

        grid = self._grid()
        a, b = self._images()
        newton = BeckmannNewtonSolver(
            grid, options={"num_iter": 200, "tol_residual": 1e-3}
        )
        mass_diff = np.asarray(b.img, np.float32) - np.asarray(a.img, np.float32)
        _, fluxes, _, _ = newton.solve_beckmann_problem(mass_diff)

        gp = BeckmannGproxPGHDSolver(grid)
        potential = np.asarray(
            gp.compute_kantorovich_potential(mass_diff, fluxes)
        )
        assert potential.shape == (10, 10) and np.isfinite(potential).all()
        primal = gp.compute_primal(fluxes)
        dual = gp.compute_dual(potential, mass_diff)
        # weak duality gap small at the optimum (float32 + regularization)
        assert abs(primal - dual) / max(primal, 1e-30) < 0.05


# ------------------------------------------------------- mass-result aliases


def _mass_results():
    shape = (8, 8)
    meta = dict(width=1.0, height=1.0)
    mass = da.ScalarImage(np.full(shape, 0.5, np.float32), **meta)
    sat_g = da.ScalarImage(np.full(shape, 0.25, np.float32), **meta)
    conc = da.ScalarImage(np.full(shape, 0.75, np.float32), **meta)
    return da.MassAnalysisResults(
        time=1.0,
        mass=mass,
        mass_g=mass,
        mass_aq=mass,
        saturation_g=sat_g,
        concentration_aq=conc,
    )


def test_mass_analysis_reference_aliases():
    res = _mass_results()
    assert res.concentration_co2_aq is res.concentration_aq
    assert res.normalized_signal_aq is res.concentration_aq
    assert res.normalized_signal_g is res.saturation_g
    sat_aq = res.saturation_aq
    np.testing.assert_allclose(np.asarray(sat_aq.img), 0.75, atol=1e-7)
    # missing gas saturation -> no aqueous saturation
    empty = da.MassAnalysisResults(time=0.0, mass=res.mass)
    assert empty.saturation_aq is None


# ----------------------------------------------- multiphase contour plotting


class TestMultiphaseContourPlots:
    def _setup(self):
        geom = da.Geometry(space_dim=2, num_voxels=(8, 8), dimensions=[1, 1])
        analysis = da.MultiphaseTimeSeriesAnalysis(geom)
        img = da.OpticalImage(
            np.full((8, 8, 3), 0.5, np.float32), width=1.0, height=1.0
        )
        return analysis, img, _mass_results()

    def test_plot_result(self, tmp_path):
        analysis, _, res = self._setup()
        out = tmp_path / "mass.png"
        analysis.plot_result(res, "mass", out, vmax=1.0)
        assert out.exists() and out.stat().st_size > 0

    def test_plot_contour_signal_and_mass(self, tmp_path):
        analysis, img, res = self._setup()
        sig = analysis.plot_contour_signal(
            img, res, values_aq=[0.1, 0.5], values_g=[0.2], path=tmp_path / "s.png"
        )
        assert isinstance(sig, np.ndarray) and sig.ndim == 3 and sig.shape[-1] == 3
        assert (tmp_path / "s.png").exists()

        mass = analysis.plot_contour_mass(
            img, res, values=[0.1, 0.3, 0.45], path=tmp_path / "m.png"
        )
        assert isinstance(mass, np.ndarray) and mass.shape[-1] == 3
        assert (tmp_path / "m.png").exists()

    def test_simple_run_contour_family(self, tmp_path):
        geom = da.Geometry(space_dim=2, num_voxels=(8, 8), dimensions=[1, 1])
        run = da.SimpleRunAnalysis(geom)
        img = da.OpticalImage(
            np.full((8, 8, 3), 0.5, np.float32), width=1.0, height=1.0
        )
        res = _mass_results()
        cases = [
            ("pure", run.plot_pure_contour_signal, (img, res, "aqueous", 0.1)),
            ("simple", run.plot_simple_contour_signal, (img, res)),
            ("satconc", run.plot_contour_saturation_concentration, (img, res)),
            ("sat", run.plot_contour_saturation, (img, res)),
            ("conc", run.plot_contour_concentration, (img, res)),
            ("dissolved", run.plot_dissolved_CO2, (img, img, res)),
            ("gas", run.plot_gas, (img, img, res)),
        ]
        for name, fn, args in cases:
            out = tmp_path / f"{name}.png"
            result = fn(*args, out)
            assert isinstance(result, np.ndarray), name
            assert out.exists() and out.stat().st_size > 0, name


# ------------------------------------------------------- label map helpers


def test_label_color_map_helpers():
    cmap = da.LabelColorMap(
        {0: np.array([1.0, 0.0, 0.0]), 2: np.array([0.0, 0.0, 1.0])}
    )
    assert cmap.labels() == [0, 2]
    np.testing.assert_allclose(cmap.mean(), [0.5, 0.0, 0.5])


def test_label_color_path_map_refine():
    path_map = da.LabelColorPathMap(
        {
            0: da.ColorPath(colors=[np.zeros(3), np.ones(3)]),
            1: da.ColorPath(colors=[np.zeros(3), np.array([1.0, 0.0, 0.0])]),
        }
    )
    refined = da.LabelColorPathMap.refine(path_map, num_segments=4)
    assert isinstance(refined, da.LabelColorPathMap)
    assert set(refined.keys()) == {0, 1}
    for label, color_path in refined.items():
        assert color_path.num_segments == 4
        # endpoints preserved
        np.testing.assert_allclose(
            np.asarray(color_path.colors[0]), np.zeros(3), atol=1e-7
        )


# ------------------------------------------------------ multi-contour plots


def test_plot_contour_on_image_multi_and_return_image(tmp_path):
    from darsia_tpu.utils.augmented_plotting import plot_contour_on_image

    img = np.full((16, 16, 3), 0.4, np.float32)
    mask_a = np.zeros((16, 16), bool)
    mask_a[4:8, 4:8] = True
    mask_b = np.zeros((16, 16), bool)
    mask_b[9:14, 9:14] = True

    out = plot_contour_on_image(
        img=img,
        mask=[mask_a, mask_b],
        color=[(255, 0, 0), (0, 127, 255)],
        alpha=[1.0, 0.5],
        thickness=3,
        path=tmp_path / "multi.png",
        show_plot=False,
        return_image=True,
    )
    assert isinstance(out, np.ndarray)
    assert out.ndim == 3 and out.shape[-1] == 3
    assert (tmp_path / "multi.png").exists()

    # legacy singular form still returns the figure
    fig = plot_contour_on_image(img, mask_a, color="g")
    assert not isinstance(fig, np.ndarray)


# ------------------------------------------------- MG level-wise components


class TestMGLevelWise:
    def test_operator_matches_definition(self):
        from darsia_tpu.utils.linear_solvers import MG

        mg = MG(depth=2, dim=2, mass_coeff=2.0, diffusion_coeff=0.0)
        x = np.arange(16.0, dtype=np.float32).reshape(4, 4)
        # no diffusion: operator is pure mass scaling
        np.testing.assert_allclose(
            np.asarray(mg.operator(x)), 2.0 * x, atol=1e-6
        )

    def test_restriction_prolongation_shapes(self):
        from darsia_tpu.utils.linear_solvers import MG

        mg = MG(depth=2, dim=2)
        x = np.random.default_rng(0).normal(size=(8, 8)).astype(np.float32)
        coarse = np.asarray(mg.restriction(x))
        assert coarse.shape == (4, 4)
        fine = np.asarray(mg.prolongation(coarse))
        assert fine.shape == (8, 8)
        # constants are reproduced by the transfer pair
        const = np.ones((8, 8), np.float32)
        np.testing.assert_allclose(
            np.asarray(mg.prolongation(mg.restriction(const))), 1.0, atol=1e-5
        )

    def test_parameter_stack(self):
        from darsia_tpu.utils.linear_solvers import MG

        fine_coeff = np.ones((8, 8), np.float32)
        mg = MG(depth=2, dim=2, mass_coeff=fine_coeff, diffusion_coeff=1.0)
        mg.restrict_parameters()
        assert np.asarray(mg.mass_coeff).shape == (4, 4)
        mg.prolongate_parameters()
        assert np.asarray(mg.mass_coeff).shape == (8, 8)
        with pytest.raises(RuntimeError):
            mg.prolongate_parameters()

    def test_base_v_cycle_reduces_residual(self):
        from darsia_tpu.utils.linear_solvers import MG

        mg = MG(depth=2, dim=2, mass_coeff=1.0, diffusion_coeff=1.0)
        rng = np.random.default_rng(2)
        rhs = rng.normal(size=(16, 16)).astype(np.float32)
        x0 = np.zeros_like(rhs)
        x1 = np.asarray(mg.base_V_Cycle(x0, rhs))
        r0 = np.linalg.norm(rhs - np.asarray(mg.operator(x0)))
        r1 = np.linalg.norm(rhs - np.asarray(mg.operator(x1)))
        assert r1 < 0.5 * r0
