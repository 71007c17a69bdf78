"""Tests for the Rig, colorchecker finder, and analysis presets."""

from datetime import datetime, timedelta

import numpy as np
import pytest

import darsia_tpu as da


@pytest.fixture
def rig_assets(tmp_path):
    rng = np.random.default_rng(0)
    base = rng.uniform(0.3, 0.6, size=(64, 96, 3)).astype(np.float32)
    np.save(tmp_path / "baseline.npy", base)
    labels = np.zeros((64, 96), dtype=np.int32)
    labels[:, 48:] = 1
    np.save(tmp_path / "labels.npy", labels)
    np.save(tmp_path / "depth.npy", np.full((64, 96), 0.02, np.float32))
    (tmp_path / "facies.csv").write_text(
        "id,porosity,permeability\n0,0.44,2e-10\n1,0.36,9e-11\n"
    )

    class FakeExperiment:
        experiment_start = datetime(2026, 8, 1, 12, 0)
        injection_protocol = None
        pressure_temperature_protocol = None

        def get_datetime(self, path):
            return self.experiment_start + timedelta(hours=1)

    return tmp_path, FakeExperiment()


class TestColorCheckerFinder:
    def _image_with_checker(self, corner):
        rng = np.random.default_rng(1)
        img = rng.uniform(0.3, 0.5, size=(400, 600, 3))
        ref = da.ColorCheckerAfter2014().swatches_rgb
        r0 = 30 if corner.startswith("upper") else 250
        c0 = 40 if corner.endswith("left") else 420
        for i in range(4):
            for j in range(6):
                img[r0 + i * 20:r0 + (i + 1) * 20, c0 + j * 20:c0 + (j + 1) * 20] = (
                    ref[i, j]
                )
        return img, (r0, c0)

    def test_detects_checker(self):
        img, (r0, c0) = self._image_with_checker("upper_left")
        checker, voxels = da.find_colorchecker(img, "upper_left")
        ref = da.ColorCheckerAfter2014().swatches_rgb
        assert np.abs(checker.swatches_rgb - ref).mean() < 0.05
        assert abs(voxels[0][0] - r0) <= 10 and abs(voxels[0][1] - c0) <= 10

    def test_rotated_checker_reoriented(self):
        img, _ = self._image_with_checker("upper_left")
        checker, _ = da.find_colorchecker(img[::-1, ::-1].copy(), "lower_right")
        ref = da.ColorCheckerAfter2014().swatches_rgb
        assert np.abs(checker.swatches_rgb - ref).mean() < 0.05

    def test_no_checker_raises(self):
        rng = np.random.default_rng(2)
        img = rng.uniform(0.3, 0.5, size=(400, 600, 3))
        with pytest.raises(ValueError, match="No color checker"):
            da.find_colorchecker(img, "upper_left")


class TestRig:
    def test_setup_and_read(self, rig_assets):
        tmp_path, experiment = rig_assets
        rig = da.Rig()
        rig.setup(
            experiment=experiment,
            baseline_path=tmp_path / "baseline.npy",
            depth_map_path=tmp_path / "depth.npy",
            labels_path=tmp_path / "labels.npy",
            facies_props_path=tmp_path / "facies.csv",
        )
        assert sorted(
            np.unique(np.asarray(rig.labels.img)).tolist()
        ) == [0, 1]
        porosity = np.asarray(rig.porosity.img)
        assert porosity.min() == pytest.approx(0.36)
        assert porosity.max() == pytest.approx(0.44)
        assert type(rig.geometry).__name__ == "ExtrudedPorousGeometry"
        assert [type(c).__name__ for c in rig.corrections] == ["Resize"]
        # Inner labels exclude the label boundary stripe.
        inner = np.asarray(rig.inner_labels.img)
        assert not inner[:, 47:49].any() and inner[:, :40].all()

        img = rig.read_image(tmp_path / "baseline.npy")
        assert np.asarray(img.img).shape == (64, 96, 3)
        # Protocol-derived relative time: 1 hour.
        assert float(np.asarray(img.time)) == pytest.approx(3600.0)

    def test_save_load_roundtrip(self, rig_assets):
        tmp_path, experiment = rig_assets
        rig = da.Rig()
        rig.setup(
            experiment=experiment,
            baseline_path=tmp_path / "baseline.npy",
            depth_map_path=tmp_path / "depth.npy",
            labels_path=tmp_path / "labels.npy",
            facies_props_path=tmp_path / "facies.csv",
        )
        rig.save(tmp_path / "rig")
        reloaded = da.Rig.load(tmp_path / "rig")
        assert np.allclose(
            np.asarray(reloaded.baseline.img), np.asarray(rig.baseline.img)
        )
        assert np.allclose(
            np.asarray(reloaded.porosity.img), np.asarray(rig.porosity.img)
        )
        assert [type(c).__name__ for c in reloaded.corrections] == ["Resize"]

    def test_mass_analysis_wiring(self, rig_assets):
        tmp_path, experiment = rig_assets
        rig = da.Rig()
        rig.setup(
            experiment=experiment,
            baseline_path=tmp_path / "baseline.npy",
            depth_map_path=tmp_path / "depth.npy",
            labels_path=tmp_path / "labels.npy",
            facies_props_path=tmp_path / "facies.csv",
        )
        rig.setup_mass_analysis(
            atmospheric_pressure=1.01, atmospheric_temperature=22.0
        )
        assert isinstance(rig.co2_mass_analysis, da.CO2MassAnalysis)


class TestPresetsAnalysis:
    def test_porosity_analysis_discriminates_grains(self):
        rng = np.random.default_rng(3)
        # Sand = light color, grains = dark spots.
        base = np.full((40, 60, 3), 0.7) + rng.normal(0, 0.01, (40, 60, 3))
        base[10:14, 10:14] = 0.1  # dark grain cluster
        img = da.Image(base.astype(np.float32), width=1.0, height=1.0,
                       color_space="RGB")
        analysis = da.PorosityAnalysis(
            img, mode="random_samples", sample_width=10, sample_num=8,
            num_clusters=3,
        )
        porosity = analysis(img)
        arr = np.asarray(porosity.img)
        assert arr[30, 30] > 0.9  # sand
        assert arr[11, 11] < arr[30, 30]  # grain has reduced porosity

    def test_multichromatic_calibrate_from_samples(self):
        base = np.full((30, 40, 3), 0.5, dtype=np.float32)
        img_arr = base.copy()
        img_arr[:, 20:] = [0.8, 0.3, 0.3]  # tracer region
        baseline = da.Image(base, width=1.0, height=1.0, color_space="RGB")
        image = da.Image(img_arr, width=1.0, height=1.0, color_space="RGB")
        analysis = da.MultichromaticTracerAnalysis(baseline, relative=True)
        analysis.calibrate_from_samples(
            image,
            samples_per_label=[[(slice(5, 15), slice(25, 35))]],
            concentrations_per_label=[[1.0]],
            num_clusters=2,
        )
        out = np.asarray(analysis(image).img)
        assert out[:, 25:].mean() > 0.5
        assert out[:, :15].mean() < 0.3

    def test_porosity_based_averaging(self):
        labels = np.zeros((32, 32), dtype=int)
        labels[16:, :] = 1
        labels_img = da.Image(labels, width=1.0, height=1.0, scalar=True)
        porosity = np.ones((32, 32))
        ref = da.Image(np.zeros((32, 32)), width=1.0, height=1.0, scalar=True)
        averaging = da.porosity_based_averaging(
            labels_img, porosity, ref, rev_size=0.2, disk_size=2
        )
        signal = np.ones((32, 32))
        out = np.asarray(averaging(signal))
        # Boundary stripe is deactivated; interior averages to ~1.
        assert out[4, 16] == pytest.approx(1.0, abs=1e-5)
