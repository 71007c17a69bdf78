"""API parity batch: matrix-free Beckmann saddle seams, skeleton method,
Experiment ABC, CO2 meta paths, SimpleFluidFlower activation, color-range
raster views, Rig CSV import, heterogeneous calibration entry points.

Parity targets: reference ``measure/beckmann_problem.py:330-1060``,
``single_image_analysis/skeleton_analysis.py:90-130``,
``experiment/experiment.py:17-36``, ``multiphase/fluidflower_co2_meta.py:238-262``,
``presets/fluidflower/simplefluidflower.py:436-673``,
``signals/color/discrete_color_range.py:36-114``, ``presets/workflows/rig.py:1053-1133``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

import darsia_tpu as da
from darsia_tpu.measure import beckmann_kernels as bk
from darsia_tpu.measure.beckmann import BeckmannNewtonSolver


class TestBeckmannSaddleSeams:
    def _problem(self):
        return BeckmannNewtonSolver(da.Grid((8, 8), 0.125))

    def test_exact_linearization_matches_residual(self):
        problem = self._problem()
        rng = np.random.default_rng(0)
        fluxes = tuple(
            rng.normal(size=s).astype(np.float32)
            for s in problem.grid.faces_shape
        )
        p = rng.normal(size=(8, 8)).astype(np.float32)
        solution = problem.flat_view(fluxes, p)
        operator = problem.exact_linearization(solution)
        applied = np.asarray(operator(solution))
        # The linearization applied to the solution equals the residual of
        # the optimality system at zero mass rhs (Newton residual seam).
        residual = np.asarray(
            problem.compute_residual(fluxes, p, np.zeros((8, 8), np.float32))
        )
        np.testing.assert_allclose(applied, residual, rtol=1e-4, atol=1e-5)

    def test_broken_darcy_block_structure(self):
        problem = self._problem()
        rng = np.random.default_rng(1)
        flux_block = tuple(
            np.abs(rng.normal(size=s)).astype(np.float32) + 0.5
            for s in problem.grid.faces_shape
        )
        operator = problem.broken_darcy_with_custom_flux_block(flux_block)
        # Pure-pressure input exercises only the -G block.
        p = rng.normal(size=(8, 8)).astype(np.float32)
        zero_fluxes = tuple(
            np.zeros(s, np.float32) for s in problem.grid.faces_shape
        )
        out = operator(problem.flat_view(zero_fluxes, p))
        grad = bk.pressure_gradient_faces(p, problem.face_vol, 2)
        np.testing.assert_allclose(
            np.asarray(problem.flux_view(out)[0]), -np.asarray(grad[0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(problem.pressure_view(out)), 0.0, atol=1e-6
        )

    def test_eliminate_flux_schur(self):
        problem = self._problem()
        rng = np.random.default_rng(2)
        face_weights = tuple(
            np.abs(rng.normal(size=s)).astype(np.float32) + 0.5
            for s in problem.grid.faces_shape
        )
        flux_res = tuple(
            rng.normal(size=s).astype(np.float32)
            for s in problem.grid.faces_shape
        )
        div_res = rng.normal(size=(8, 8)).astype(np.float32)
        schur, reduced_rhs, flux_inv = problem.eliminate_flux(
            face_weights, flux_res, div_res
        )
        assert np.asarray(reduced_rhs).shape == (8, 8)
        # J^-1 is the inverse of the diagonal flux block.
        np.testing.assert_allclose(
            np.asarray(flux_inv[0])
            * problem.cell_vol
            * np.asarray(face_weights[0]),
            1.0,
            rtol=1e-5,
        )
        # The Schur operator is symmetric.
        x = rng.normal(size=(8, 8)).astype(np.float32)
        y = rng.normal(size=(8, 8)).astype(np.float32)
        assert float(np.sum(np.asarray(schur(x)) * y)) == pytest.approx(
            float(np.sum(x * np.asarray(schur(y)))), rel=1e-4
        )
        # Gauge fix projects the rhs to mean zero.
        _, projected = problem.eliminate_lagrange_multiplier(schur, reduced_rhs)
        assert float(np.mean(np.asarray(projected))) == pytest.approx(0.0, abs=1e-6)

    def test_linear_solve_stats(self):
        problem = self._problem()
        face_weights = tuple(problem.base_face_weights)
        rng = np.random.default_rng(3)
        rhs = rng.normal(size=(8, 8)).astype(np.float32)
        solution, stats = problem.linear_solve(face_weights, rhs)
        assert set(stats) == {"time_setup", "time_solve"}
        trans = problem.transmissibilities(face_weights)
        applied = np.asarray(bk.tpfa_apply(np.asarray(solution), trans, 2))
        projected = rhs - rhs.mean()
        assert np.linalg.norm(applied - projected) < 1e-3 * np.linalg.norm(
            projected
        )


class TestExperimentABC:
    def test_abstract_properties(self):
        from darsia_tpu.experiment.experiment import Experiment

        names = {"atmospheric_pressure", "temperature", "injection_start",
                 "injection_end"}
        assert names <= set(Experiment.__abstractmethods__)
        with pytest.raises(TypeError):
            Experiment()


class TestCO2MetaPaths:
    def test_derived_paths(self, tmp_path):
        from darsia_tpu.multiphase.fluidflower_co2_meta import FluidFlowerCO2Meta

        data = tmp_path / "data"
        data.mkdir()
        (data / "img_000.JPG").touch()
        meta = tmp_path / "meta.toml"
        meta.write_text(
            "\n".join(
                [
                    "[data]",
                    f'folder = "{data}"',
                    "pad = 3",
                    "[results]",
                    f'folder = "{tmp_path / "results"}"',
                    'fluidflower = "fluidflower"',
                ]
            )
        )
        co2_meta = FluidFlowerCO2Meta(meta)
        assert co2_meta.fluidflower_folder == tmp_path / "results" / "fluidflower"
        assert co2_meta.co2_analysis_data.name == "co2_analysis.csv"
        assert co2_meta.co2_g_analysis_data.name == "co2_g_analysis.csv"
        assert co2_meta.pw_transformation_aq_data.name == "pw_transformation_aq.csv"
        assert co2_meta.pw_transformation_g_data.name == "pw_transformation_g.csv"
        assert co2_meta.log_folder.name == "log"
        co2_meta.update("fluidflower", tmp_path / "other")
        assert co2_meta.co2_analysis_data.parent == tmp_path / "other"


class TestDiscreteColorRangeViews:
    def test_shape_and_colors(self):
        from darsia_tpu.signals.color.color_range import (
            ColorSpectrum,
            DiscreteColorRange,
        )

        rng = np.random.default_rng(0)
        box = DiscreteColorRange(resolution=4).fit(rng.random((50, 3)))
        assert box.shape == (4, 4, 4)
        colors = box.colors()
        assert colors.shape == (4, 4, 4, 3)
        flat = box.colors(flat=True)
        assert flat.shape == (64, 3)
        np.testing.assert_allclose(flat.min(0), box.min_color, atol=1e-12)
        np.testing.assert_allclose(flat.max(0), box.max_color, atol=1e-12)
        spectrum = ColorSpectrum(resolution=4).fit(rng.random((20, 3)))
        assert spectrum.shape == (4, 4, 4)


class TestRigCsvImport:
    def test_roundtrip(self, tmp_path):
        from darsia_tpu.presets.workflows.rig import Rig

        # 3x4 field on cell centers: x fastest, y slowest.
        xs = np.array([0.5, 1.5, 2.5, 3.5])
        ys = np.array([0.5, 1.5, 2.5])
        rows = []
        values = np.arange(12, dtype=float).reshape(3, 4)
        for j, y in enumerate(ys):
            for i, x in enumerate(xs):
                rows.append(f"{x},{y},{values[j, i]}")
        csv = tmp_path / "field.csv"
        csv.write_text("x,y,value\n" + "\n".join(rows))

        rig = Rig.__new__(Rig)  # import_from_csv is state-free
        image = rig.import_from_csv(csv)
        arr = np.asarray(image.img)
        assert arr.shape == (3, 4)
        # Top row of the image holds the largest y.
        np.testing.assert_allclose(arr[0], values[2])
        np.testing.assert_allclose(arr[-1], values[0])
        assert image.dimensions[0] == pytest.approx(3.0)
        assert image.dimensions[1] == pytest.approx(4.0)
        ext = rig.import_from_csv(csv, is_extensive=True)
        assert type(ext).__name__ == "ExtensiveImage"
        with pytest.raises(FileNotFoundError):
            rig.import_from_csv(tmp_path / "missing.csv")


class TestSimpleFluidFlowerActivation:
    def test_set_and_activate(self):
        from darsia_tpu.presets.fluidflower.simplefluidflower import (
            SimpleFluidFlower,
        )

        flow = SimpleFluidFlower.__new__(SimpleFluidFlower)
        base = da.OpticalImage(
            np.full((20, 30, 3), 0.5, np.float32), width=3.0, height=2.0
        )
        flow.raw_baseline = base
        flow.drift_config = {}
        flow.curvature_config = {}
        flow.width = 3.0
        flow.water_height = 1.5

        class Doubler:
            def __call__(self, img):
                out = img.copy()
                out.img = np.asarray(img.img) * 2.0
                return out

        flow.color_correction = Doubler()
        flow.set_corrections()  # no configs -> nothing rebuilt, no error
        flow.activate_corrections(["color"], [])
        assert len(flow.corrections) == 1
        assert np.asarray(flow.baseline.img).max() == pytest.approx(1.0)
        flow.activate_corrections([], ["color"])
        assert flow.corrections == [] and len(flow.extra_corrections) == 1

        restricted = flow.restrict_to_water_height(base)
        assert np.asarray(restricted.img).shape[0] < 20


class TestHeterogeneousCalibrationEntryPoints:
    def test_local_calibration_flash_is_upstream_stub(self):
        from darsia_tpu.presets.workflows.heterogeneous_color_analysis import (
            HeterogeneousColorAnalysis,
        )

        with pytest.raises(NotImplementedError):
            HeterogeneousColorAnalysis.local_calibration_flash(
                object.__new__(HeterogeneousColorAnalysis), None, None, []
            )

    def test_manual_calibration_returns_session(self):
        from darsia_tpu.presets.workflows.heterogeneous_color_to_mass_analysis import (
            HeterogeneousColorToMassAnalysis,
        )

        assert hasattr(HeterogeneousColorToMassAnalysis, "manual_calibration")


class TestCurvatureTemporaryImage:
    def test_uint8_view(self):
        correction = da.CurvatureCorrection(
            image=np.linspace(0, 1, 12, dtype=np.float32).reshape(2, 2, 3),
            width=1.0,
            height=1.0,
        )
        view = correction.temporary_image
        assert view.dtype == np.uint8
        assert view.max() == 255
