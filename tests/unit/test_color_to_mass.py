"""Tests for the heterogeneous color->pH->flash->mass chain."""

import numpy as np
import pytest

import darsia_tpu as da


@pytest.fixture
def chain_setup():
    H, W = 48, 64
    labels = np.zeros((H, W), np.int32)
    labels[:, 32:] = 1
    labels_img = da.Image(labels, width=2.0, height=1.0, scalar=True)
    base = np.full((H, W, 3), 0.5, np.float32)
    baseline = da.Image(base, width=2.0, height=1.0, color_space="RGB")

    img_arr = base.copy()
    img_arr[10:30, 5:25] += [0.3, -0.1, -0.1]
    img_arr[10:30, 40:60] += [0.15, -0.05, -0.05]
    img = da.Image(np.clip(img_arr, 0, 1), width=2.0, height=1.0,
                   color_space="RGB")
    img.time = 3600.0

    paths = {
        0: da.ColorPath(
            relative_colors=[np.zeros(3), np.array([0.3, -0.1, -0.1])],
            base_color=np.full(3, 0.5),
        ),
        1: da.ColorPath(
            relative_colors=[np.zeros(3), np.array([0.15, -0.05, -0.05])],
            base_color=np.full(3, 0.5),
        ),
    }
    interp = {
        k: da.ColorPathInterpolation(p, da.ColorMode.RELATIVE, values=[0, 1])
        for k, p in paths.items()
    }
    sig = {
        k: da.PWTransformation(supports=[0, 0.5, 1], values=[0, 0.4, 1])
        for k in paths
    }
    flash = da.SimpleFlash(0.05, 0.5, 0.5, 1.0)
    mass = da.CO2MassAnalysis(baseline, atmospheric_pressure=1.01,
                              atmospheric_temperature=22.0)
    depth = da.Image(np.full((H, W), 0.02, np.float32), width=2.0, height=1.0,
                     scalar=True)
    porosity = da.Image(np.full((H, W), 0.44, np.float32), width=2.0,
                        height=1.0, scalar=True)
    geom = da.ExtrudedPorousGeometry(
        porosity=porosity, depth=depth, **baseline.shape_metadata()
    )
    chain = da.HeterogeneousColorToMassAnalysis(
        baseline=baseline, labels=labels_img,
        color_mode=da.ColorMode.RELATIVE,
        color_path_interpretation=interp, signal_functions=sig,
        flash=flash, co2_mass_analysis=mass, geometry=geom,
    )
    return chain, img, geom


class TestPWTransformation:
    def test_interp_and_inverse(self):
        pw = da.PWTransformation(supports=[0, 0.5, 1], values=[0, 0.2, 1])
        assert float(pw(np.array(0.5))) == pytest.approx(0.2)
        assert float(pw(np.array(0.75))) == pytest.approx(0.6)
        assert float(pw.inverse(0.2)) == pytest.approx(0.5)

    def test_monotonicity_enforced(self):
        with pytest.raises(AssertionError, match="monotonicity"):
            da.PWTransformation(supports=[0, 0.5, 1], values=[0, 0.8, 0.5])

    def test_save_load(self, tmp_path):
        pw = da.PWTransformation(supports=[0, 1], values=[0, 2])
        pw.save(tmp_path / "pw.csv")
        loaded = da.PWTransformation.load(tmp_path / "pw.csv")
        assert float(loaded(np.array(0.5))) == pytest.approx(1.0)


class TestColorToMassChain:
    def test_full_chain(self, chain_setup):
        chain, img, geom = chain_setup
        result = chain(img)
        ci = np.asarray(chain.call_color_interpretation(img).img)
        # Each zone's own path resolves its plume to full signal.
        assert ci[20, 15] == pytest.approx(1.0, abs=0.02)
        assert ci[20, 50] == pytest.approx(1.0, abs=0.02)
        assert ci[2, 2] == pytest.approx(0.0, abs=0.02)
        m = np.asarray(result.mass.img)
        assert m[20, 15] > m[2, 2]
        assert float(geom.integrate(result.mass)) > 0

    def test_expert_knowledge_constrains_gas(self, chain_setup):
        chain, img, _ = chain_setup
        from darsia_tpu.presets.workflows.config.roi import RoiConfig

        roi = RoiConfig()
        roi.roi = np.array([[0.0, 0.0], [1.0, 1.0]])  # left half only
        chain.expert_knowledge_adapter = da.ExpertKnowledgeAdapter(
            saturation_g_rois={"left": roi}
        )
        result = chain(img)
        sg = np.asarray(result.saturation_g.img)
        assert np.abs(sg[:, 32:]).max() == 0.0
        assert sg[20, 15] > 0.5

    def test_automatic_calibration_converges(self, chain_setup):
        chain, img, geom = chain_setup

        class Protocol:
            def injected_mass(self, date=None, time=None):
                return 0.002

        class Exp:
            injection_protocol = Protocol()

        before = float(geom.integrate(chain(img).mass))
        chain.automatic_calibration([img], Exp(), maxiter=40)
        after = float(geom.integrate(chain(img).mass))
        assert abs(after - 0.002) < abs(before - 0.002)
        assert abs(after - 0.002) / 0.002 < 0.2

    def test_manual_calibration_session(self, chain_setup, tmp_path):
        """Headless propose/preview/accept stepper over the chain's signal
        functions + flash bounds (reference manual UI :183-2550)."""
        chain, img, geom = chain_setup

        class Protocol:
            def injected_mass(self, date=None, time=None):
                return 0.002

        class Exp:
            injection_protocol = Protocol()

        session = chain.manual_calibration_session(
            [img], Exp(), log=tmp_path / "log"
        )
        baseline_metrics = session.propose()
        assert baseline_metrics["error"] >= 0
        # A slider move changes the chain and re-evaluates cheaply.
        label = sorted(chain.signal_model.model[1].keys())[0]
        old_values = np.asarray(chain.signal_model.model[1][label].values)
        moved = session.propose(
            signal_values={label: old_values * 1.2}
        )
        np.testing.assert_allclose(
            chain.signal_model.model[1][label].values, old_values * 1.2
        )
        assert len(session.iterations) == 2
        preview = session.preview(path=tmp_path / "preview.png")
        assert (tmp_path / "preview.png").exists()
        assert preview["detected_mass"].shape == (1,)
        calibrated = session.accept()
        assert calibrated is chain
        assert (tmp_path / "log" / "calibration_log.npz").exists()
        assert (tmp_path / "log" / "calibrated").exists()
        # moved is a valid metrics dict from the proposal
        assert np.isfinite(moved["error"])

    def test_save_load_roundtrip(self, chain_setup, tmp_path):
        chain, img, geom = chain_setup
        reference = float(geom.integrate(chain(img).mass))
        chain.save(tmp_path / "c2m")
        chain.flash.update(min_value_aq=0.4)  # perturb
        chain.load(tmp_path / "c2m")
        restored = float(geom.integrate(chain(img).mass))
        assert restored == pytest.approx(reference, rel=1e-5)


class TestHeterogeneousColorAnalysis:
    def test_per_label_paths(self):
        H, W = 32, 48
        labels = np.zeros((H, W), np.int32)
        labels[:, 24:] = 1
        labels_img = da.Image(labels, width=1.0, height=1.0, scalar=True)
        base = np.full((H, W, 3), 0.5, np.float32)
        baseline = da.Image(base, width=1.0, height=1.0, color_space="RGB")
        analysis = da.HeterogeneousColorAnalysis(
            baseline, labels_img, da.ColorMode.RELATIVE
        )
        # Calibrate label 0 with a red path, label 1 with a green path.
        red = da.ColorPath(
            relative_colors=[np.zeros(3), np.array([0.4, 0, 0])],
            base_color=np.full(3, 0.5),
        )
        green = da.ColorPath(
            relative_colors=[np.zeros(3), np.array([0, 0.4, 0])],
            base_color=np.full(3, 0.5),
        )
        analysis.local_calibration_colors(0, baseline, None, color_path=red)
        analysis.local_calibration_colors(1, baseline, None, color_path=green)

        img_arr = base.copy()
        img_arr[:, 5:20, 0] += 0.2  # half-way along red path in zone 0
        img_arr[:, 28:44, 1] += 0.4  # full green in zone 1
        img = da.Image(img_arr, width=1.0, height=1.0, color_space="RGB")
        out = np.asarray(analysis(img).img)
        assert out[16, 10] == pytest.approx(0.5, abs=0.05)
        assert out[16, 35] == pytest.approx(1.0, abs=0.05)
        assert out[16, 0] == pytest.approx(0.0, abs=0.05)

    def test_save_load_roundtrip(self, tmp_path):
        """Per-label color-path calibration persists as JSON and restores
        into a fresh analysis (reference
        heterogeneous_color_analysis.py:861-934)."""
        H, W = 24, 32
        labels = np.zeros((H, W), np.int32)
        labels[:, 16:] = 1
        labels_img = da.Image(labels, width=1.0, height=1.0, scalar=True)
        base = np.full((H, W, 3), 0.5, np.float32)
        baseline = da.Image(base, width=1.0, height=1.0, color_space="RGB")

        def make(paths=True):
            analysis = da.HeterogeneousColorAnalysis(
                baseline, labels_img, da.ColorMode.RELATIVE
            )
            if paths:
                red = da.ColorPath(
                    relative_colors=[np.zeros(3), np.array([0.4, 0, 0])],
                    base_color=np.full(3, 0.5),
                )
                green = da.ColorPath(
                    relative_colors=[np.zeros(3), np.array([0, 0.4, 0])],
                    base_color=np.full(3, 0.5),
                )
                analysis.local_calibration_colors(
                    0, baseline, None, color_path=red
                )
                analysis.local_calibration_colors(
                    1, baseline, None, color_path=green
                )
                analysis.local_calibration_values(1, [0.0, 2.0])
            return analysis

        calibrated = make()
        img_arr = base.copy()
        img_arr[:, 2:12, 0] += 0.2
        img_arr[:, 20:30, 1] += 0.4
        img = da.Image(img_arr, width=1.0, height=1.0, color_space="RGB")
        expected = np.asarray(calibrated(img).img)
        calibrated.save(tmp_path / "paths")

        fresh = make(paths=False)
        fresh.load(tmp_path / "paths.json")
        restored = np.asarray(fresh(img).img)
        np.testing.assert_allclose(restored, expected, atol=1e-6)
        # uncalibrated analysis errors on save
        with pytest.raises(ValueError, match="Nothing to save"):
            make(paths=False).save(tmp_path / "empty")
