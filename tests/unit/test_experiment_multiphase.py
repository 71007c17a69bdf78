"""Tests for experiment protocols, flash, mass analysis, managers."""

import json
from datetime import datetime, timedelta
from pathlib import Path

import numpy as np
import pytest

import darsia_tpu as da


@pytest.fixture
def protocol_files(tmp_path):
    start = datetime(2023, 5, 1, 8, 0, 0)
    # Imaging protocol: 10 images, 1 per 30 min.
    lines = ["image_id,datetime"]
    for i in range(10):
        dt = start + timedelta(minutes=30 * i)
        lines.append(f"{i},{dt.isoformat()}")
    (tmp_path / "imaging.csv").write_text("\n".join(lines))
    # Blacklist image 3.
    (tmp_path / "blacklist.csv").write_text("image_id\n3")
    # Injection: 1 hour at 1e-6 kg/s from the start.
    end = start + timedelta(hours=1)
    (tmp_path / "injection.csv").write_text(
        "location_x,location_y,start,end,rate_kg_s\n"
        f"0.5,0.5,{start.isoformat()},{end.isoformat()},1e-6"
    )
    (tmp_path / "pt.csv").write_text(
        "datetime,pressure,temperature\n"
        f"{start.isoformat()},1.01,22.0\n"
        f"{(start + timedelta(hours=5)).isoformat()},1.03,24.0"
    )
    # Touch image files.
    paths = []
    for i in range(10):
        p = tmp_path / f"img_{i:05d}.jpg"
        p.write_bytes(b"")
        paths.append(p)
    return tmp_path, paths, start


def test_imaging_protocol(protocol_files):
    tmp_path, paths, start = protocol_files
    protocol = da.ImagingProtocol(
        tmp_path / "imaging.csv", pad=5, blacklist=tmp_path / "blacklist.csv"
    )
    assert protocol.get_datetime(paths[2]) == start + timedelta(minutes=60)
    assert protocol.is_blacklisted(paths[3])
    assert not protocol.is_blacklisted(paths[4])
    kept = protocol.find_images_for_paths(paths)
    assert len(kept) == 9


def test_injection_protocol(protocol_files):
    tmp_path, paths, start = protocol_files
    injection = da.InjectionProtocol(tmp_path / "injection.csv")
    # Half an hour in: half the mass.
    mass = injection.injected_mass(date=start + timedelta(minutes=30))
    assert np.isclose(mass, 1800 * 1e-6)
    # After the end: full mass.
    mass_full = injection.injected_mass(date=start + timedelta(hours=3))
    assert np.isclose(mass_full, 3600 * 1e-6)


def test_pressure_temperature_protocol(protocol_files):
    tmp_path, paths, start = protocol_files
    pt = da.PressureTemperatureProtocol(tmp_path / "pt.csv")
    state = pt.get_state(start + timedelta(hours=2.5))
    assert 1.01 < state.pressure < 1.03
    assert 22.0 < state.temperature < 24.0


def test_protocolled_experiment(protocol_files):
    tmp_path, paths, start = protocol_files
    experiment = da.ProtocolledExperiment(
        data=paths,
        imaging_protocol=tmp_path / "imaging.csv",
        injection_protocol=tmp_path / "injection.csv",
        pressure_temperature_protocol=tmp_path / "pt.csv",
        blacklist_protocol=tmp_path / "blacklist.csv",
    )
    # Closest image to 1 hour after start: image 2.
    path = experiment.find_images_for_times(1.0)
    assert path == paths[2]
    window_images = experiment.find_images_for_time_windows(
        [da.TimeWindow(start=0.0, end=1.0)]
    )
    assert paths[0] in window_images and paths[2] in window_images
    assert paths[3] not in window_images  # blacklisted


def test_flash():
    c_g = da.ScalarImage(
        np.array([[0.0, 0.5], [1.0, 0.02]], dtype=np.float32), dimensions=[1, 1]
    )
    c_aq = da.ScalarImage(
        np.array([[0.8, 0.2], [0.1, 0.9]], dtype=np.float32), dimensions=[1, 1]
    )
    flash = da.Flash(s_g_max=1.0, s_g_cutoff=0.05)
    chi_g, chi_aq, s_g, s_aq = flash(c_g, c_aq)
    sg = np.asarray(s_g.img)
    assert sg[0, 0] == 0.0 and sg[1, 1] == 0.0  # below cutoff
    assert np.isclose(sg[1, 0], 1.0)
    assert np.allclose(np.asarray(s_g.img) + np.asarray(s_aq.img), 1.0)


def test_simple_flash_roundtrip(tmp_path):
    signal = da.ScalarImage(
        np.linspace(0, 1, 16).reshape(4, 4).astype(np.float32), dimensions=[1, 1]
    )
    flash = da.SimpleFlash(0.1, 0.5, 0.5, 0.9)
    c_aq, s_g = flash(signal)
    assert np.asarray(c_aq.img).max() == 1.0
    flash.save(tmp_path / "flash")
    flash2 = da.SimpleFlash(0, 1, 0, 1)
    flash2.load(tmp_path / "flash.npz")
    assert flash2.max_value_g == 0.9


def test_co2_mass_analysis():
    baseline = da.ScalarImage(
        np.zeros((20, 30), dtype=np.float32), width=0.9, height=0.5
    )
    analysis = da.CO2MassAnalysis(baseline, atmospheric_pressure=1.01)
    # Density increases with depth (hydrostatic pressure).
    assert analysis.density_gaseous_co2[-1, 0] > analysis.density_gaseous_co2[0, 0]
    # Around 1.8 kg/m^3 at ~1 bar.
    assert 1.5 < analysis.density_gaseous_co2[0, 0] < 2.2
    assert 1.2 < analysis.solubility_co2[0, 0] < 2.2

    chi_g = da.full_like(baseline, np.full((20, 30), 0.5, dtype=np.float32))
    chi_aq = da.full_like(baseline, np.full((20, 30), 0.3, dtype=np.float32))
    mass, mass_g, mass_aq = analysis(chi_g, chi_aq)
    assert np.allclose(
        np.asarray(mass.img),
        np.asarray(mass_g.img) + np.asarray(mass_aq.img),
    )

    # Inverse roundtrip on a pure-aqueous map.
    s_g = da.full_like(baseline, np.zeros((20, 30), dtype=np.float32))
    c_aq = da.full_like(baseline, np.full((20, 30), 0.4, dtype=np.float32))
    result = analysis.mass_analysis(c_aq, s_g)
    inverse = analysis.inverse_mass_analysis(result.mass)
    assert np.allclose(
        np.asarray(inverse.concentration_aq.img), 0.4, atol=1e-3
    )


def test_time_series_tracking():
    baseline = da.ScalarImage(
        np.zeros((10, 10), dtype=np.float32), width=1.0, height=1.0
    )
    analysis = da.CO2MassAnalysis(baseline)
    geometry = da.Geometry(space_dim=2, num_voxels=(10, 10), dimensions=[1, 1])
    tracker = da.MultiphaseTimeSeriesAnalysis(geometry)
    for t in [1.0, 2.0, 3.0]:
        s_g = da.full_like(
            baseline, np.full((10, 10), 0.1 * t, dtype=np.float32)
        )
        c_aq = da.full_like(
            baseline, np.full((10, 10), 0.2, dtype=np.float32)
        )
        result = analysis.mass_analysis(c_aq, s_g)
        result.time = t
        tracker.track(result)
    assert len(tracker.data.times) == 3
    assert tracker.data.mass[-1] > tracker.data.mass[0]


class _SimpleTracer(da.TracerAnalysis):
    def define_tracer_analysis(self):
        return da.ConcentrationAnalysis(
            base=self.base,
            signal_reduction=da.MonochromaticReduction(color="gray"),
        )


def test_tracer_analysis_manager(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    base_arr = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
    base_path = tmp_path / "base.png"
    cv2.imwrite(str(base_path), base_arr[..., ::-1])
    config = {
        "physical_asset": {"dimensions": {"width": 1.0, "height": 0.6}},
        "tracer": {"cleaning_filter": str(tmp_path / "cleaning.npy")},
    }
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps(config))

    analysis = _SimpleTracer(base_path, config_path)
    tracer = analysis.single_image_analysis(base_path)
    assert np.asarray(tracer.img).max() < 0.05  # baseline vs itself


class TestTransformationCalibration:
    """Headless propose -> preview -> accept calibration stepper
    (reference multiphase/calibration.py:17-430 slider UI equivalent)."""

    def _session(self, tmp_path, true_scale=2.0):
        # Synthetic: signal fields whose "detected mass" depends linearly
        # on the gas transformation's end value; expected mass grows
        # linearly in time with slope true_scale * base.
        H, W = 8, 10
        geometry = da.Geometry(space_dim=2, num_voxels=(H, W), dimensions=[1, 1])
        analysis = da.MultiphaseTimeSeriesAnalysis(geometry)
        tf_g = da.PWTransformation(supports=[0.0, 1.0], values=[0.0, 1.0])
        tf_aq = da.PWTransformation(supports=[0.0, 1.0], values=[0.0, 1.0])
        times = [0.5, 1.0, 1.5, 2.0]
        paths = [tmp_path / f"img_{i}.npz" for i in range(len(times))]
        signals = {}
        for p, t in zip(paths, times):
            signal = np.full((H, W), 0.5, np.float32)
            signals[p] = (signal, t)
            p.write_bytes(b"")  # placeholder file

        def read_image(path):
            return path  # pre-mass works on the path key directly

        def pre_mass_analysis(path):
            return signals[path]

        def mass_analysis_from_pre(pre):
            signal, t = pre
            # Detected mass scales with the transformation end value.
            mass_map = da.ScalarImage(
                tf_g(signal) * t, width=1.0, height=1.0
            )
            zero = da.ScalarImage(np.zeros((H, W), np.float32), width=1, height=1)
            return da.MassAnalysisResults(
                time=t, mass=mass_map, mass_g=mass_map, mass_aq=zero
            )

        expected = lambda t: true_scale * 0.5 * t  # noqa: E731
        return da.TransformationCalibrationSession(
            tf_g,
            tf_aq,
            paths,
            analysis,
            upper_time_limit=1.25,
            read_image=read_image,
            pre_mass_analysis=pre_mass_analysis,
            mass_analysis_from_pre=mass_analysis_from_pre,
            expected_mass=expected,
            log=tmp_path / "log",
        )

    def test_propose_preview_accept(self, tmp_path):
        session = self._session(tmp_path)
        first = session.propose()
        assert first["error"] > 0
        better = session.propose(values_g=[0.0, 2.0])
        assert better["error"] < first["error"] * 1e-6  # exact match
        preview = session.preview(path=tmp_path / "preview.png")
        assert (tmp_path / "preview.png").exists()
        np.testing.assert_allclose(
            preview["detected_mass"], preview["expected_mass"], rtol=1e-6
        )
        tf_g, _ = session.accept()
        assert (tmp_path / "log" / "calibration_log.npz").exists()
        log = np.load(tmp_path / "log" / "calibration_log.npz")
        assert log["error"].shape[0] == 2
        assert tf_g.values[-1] == pytest.approx(2.0)

    def test_auto_recovers_scale(self, tmp_path):
        session = self._session(tmp_path, true_scale=3.0)
        metrics = session.auto(maxiter=200, calibrate="g")
        assert session.transformation_g.values[-1] == pytest.approx(3.0, rel=0.05)
        assert metrics["error"] < 1e-4
