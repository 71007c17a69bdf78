"""Tests for FluidFlower presets (CO2 analysis, rig, simple rig)."""

import json

import numpy as np
import pytest

import darsia_tpu as da


def _save_image(path, arr, width=2.0, height=1.0):
    img = da.Image(np.asarray(arr, np.float32), width=width, height=height,
                   color_space="RGB")
    img.save(path)
    return path


@pytest.fixture
def co2_assets(tmp_path):
    rng = np.random.default_rng(0)
    H, W = 60, 100
    base = np.full((H, W, 3), 0.55) + rng.normal(0, 0.005, (H, W, 3))
    _save_image(tmp_path / "base.npz", base)
    # CO2 plume: strong color change region; gas: very strong subregion.
    img = base.copy()
    img[20:50, 20:70] += [-0.25, -0.1, 0.2]
    img[30:45, 35:55] += [-0.2, -0.15, 0.25]
    _save_image(tmp_path / "img.npz", np.clip(img, 0, 1))

    common = {
        "diff option": "absolute",
        "restoration -> model": True,
        "restoration resize": 0.5,
        "restoration method": "chambolle",
        "restoration weight": 0.05,
        "restoration max_num_iter": 30,
        "prior remove small objects size": 5,
        "prior fill holes size": 5,
        "prior resize": 0.5,
        "prior method": "chambolle",
        "prior weight": 0.05,
        "prior max_num_iter": 30,
        "posterior criterion": "value",
        "posterior threshold": 0.02,
    }
    config = {
        "physical_asset": {"dimensions": {"width": 2.0, "height": 1.0}},
        "co2": dict(common, **{
            "color": "negative-key",
            "prior threshold value": 0.15,
            "cleaning_filter": str(tmp_path / "cache" / "c1.npy"),
        }),
        "co2(g)": dict(common, **{
            "color": "blue",
            "prior threshold value": 0.3,
            "cleaning_filter": str(tmp_path / "cache" / "c2.npy"),
        }),
    }
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps(config))
    return tmp_path, config_path


class TestFluidFlowerCO2Analysis:
    def test_phase_segmentation(self, co2_assets):
        tmp_path, config_path = co2_assets
        analysis = da.FluidFlowerCO2Analysis(
            baseline=tmp_path / "base.npz",
            config=config_path,
            results=tmp_path / "results",
        )
        co2, co2_gas = analysis.single_image_analysis(
            tmp_path / "img.npz", write_segmentation_to_file=True
        )
        c = np.asarray(co2.img, bool)
        g = np.asarray(co2_gas.img, bool)
        # Plume detected, background clean.
        assert c[35, 45] and not c[5, 5]
        # Gas detected inside the stronger subregion and a subset of CO2.
        assert g[37, 45]
        assert (~c & g).sum() == 0
        seg_files = list((tmp_path / "results" / "npy_segmentation").glob("*.npy"))
        assert len(seg_files) == 1
        seg = np.load(seg_files[0])
        assert set(np.unique(seg)).issubset({0, 1, 2})

    def test_expert_knowledge_masking(self, co2_assets):
        tmp_path, config_path = co2_assets

        class Constrained(da.FluidFlowerCO2Analysis):
            def _expert_knowledge_co2(self):
                mask = np.zeros(np.asarray(self.base.img).shape[:2], bool)
                mask[:, :50] = True  # left half only
                return mask

        analysis = Constrained(
            baseline=tmp_path / "base.npz",
            config=config_path,
            results=tmp_path / "results2",
        )
        analysis.load_and_process_image(tmp_path / "img.npz")
        co2 = analysis.determine_co2_mask()
        assert not np.asarray(co2.img, bool)[:, 50:].any()


class TestThresholdModel:
    def test_static_dispatch(self):
        model = da.ThresholdModel(key="prior ", **{"prior threshold value": 0.5})
        out = np.asarray(model(np.array([[0.2, 0.8]])))
        assert out.tolist() == [[False, True]]

    def test_dynamic_dispatch(self):
        model = da.ThresholdModel(
            key="x ",
            **{
                "x threshold dynamic": True,
                "x threshold method": "tailored global min",
                "x threshold value min": 0.1,
                "x threshold value max": 0.9,
            },
        )
        rng = np.random.default_rng(0)
        signal = np.concatenate(
            [rng.normal(0.2, 0.02, 500), rng.normal(0.7, 0.02, 500)]
        ).reshape(20, 50)
        out = np.asarray(model(signal))
        assert out.mean() == pytest.approx(0.5, abs=0.1)


class TestSimpleFluidFlower:
    def test_setup_read_save_load(self, tmp_path):
        rng = np.random.default_rng(1)
        base = (rng.uniform(0.3, 0.6, (40, 64, 3)) * 255).astype(np.uint8)
        _save_image(tmp_path / "base.npz", base / 255.0, width=0.92, height=0.55)
        rig = da.SimpleFluidFlower(
            tmp_path / "base.npz", active_corrections=["type", "resize"]
        )
        rig.setup(specs={"width": 0.92, "height": 0.55})
        assert [type(c).__name__ for c in rig.corrections] == [
            "TypeCorrection",
            "Resize",
        ]
        img = rig.read_image(tmp_path / "base.npz")
        assert np.asarray(img.img).shape == (40, 64, 3)
        rig.save(tmp_path / "rig")
        rig2 = da.SimpleFluidFlower(
            tmp_path / "base.npz", active_corrections=["type", "resize"]
        )
        rig2.load(tmp_path / "rig")
        assert rig2.width == 0.92 and rig2.porosity == 0.44
        assert len(rig2.corrections) == 2


class TestFluidFlowerRig:
    def test_segmentation_caching(self, tmp_path):
        # Two-layer image: clear horizontal interface.
        arr = np.full((40, 60, 3), 0.3)
        arr[20:] = 0.7
        _save_image(tmp_path / "base.npz", arr)
        config = {
            "physical_asset": {"dimensions": {"width": 2.0, "height": 1.0}},
            "segmentation": {
                "labels_path": str(tmp_path / "cache" / "labels.npy"),
                "marker_points": [[10, 30], [30, 30]],
                "water": [0],
                "esf": [1],
            },
        }
        config_path = tmp_path / "config.json"
        config_path.write_text(json.dumps(config))
        rig = da.FluidFlowerRig(tmp_path / "base.npz", config_path)
        labels = np.asarray(rig.labels)
        assert len(np.unique(labels)) >= 2
        assert (tmp_path / "cache" / "labels.npy").exists()
        # Second construction loads from cache.
        rig2 = da.FluidFlowerRig(tmp_path / "base.npz", config_path)
        assert np.array_equal(np.asarray(rig2.labels), labels)
        mask = rig._labels_to_mask([int(labels[5, 5])])
        assert mask[5, 5]
