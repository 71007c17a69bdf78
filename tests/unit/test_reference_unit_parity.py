"""Direct unit coverage for symbols the reference's unit suite exercises
by name (tests/unit/test_{point,data_registry,restoration_config,
workflow_utils_config,helper_config,image_porosity,setup_protocols,
analysis_scalar_products,mode_resolution,color_spectrum_weighting,
calibration_metadata}.py) that previously had only indirect coverage.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

import darsia_tpu as da


class TestVoxelCenters:
    def test_voxel_center(self):
        center = da.VoxelCenter([3.7, 5.2])
        np.testing.assert_allclose(np.asarray(center), [3.5, 5.5])

    def test_voxel_center_cartesian_input(self):
        # Cartesian ordering swaps leading axes before centering.
        center = da.VoxelCenter([3.0, 5.0], matrix_indexing=False)
        np.testing.assert_allclose(np.asarray(center), [5.5, 3.5])

    def test_voxel_center_array(self):
        arr = da.VoxelCenterArray([[1.0, 2.0], [3.9, 4.1]])
        np.testing.assert_allclose(np.asarray(arr), [[1.5, 2.5], [3.5, 4.5]])
        first = arr[0]
        assert isinstance(first, da.VoxelCenter)
        np.testing.assert_allclose(np.asarray(first), [1.5, 2.5])


class TestDataRegistry:
    def test_load_resolve_keys(self):
        from darsia_tpu.presets.workflows.config.data import DataRegistry

        registry = DataRegistry().load(
            {
                "interval": {"early": {"start": 0.0, "end": 2.0, "num": 3}},
                "time": {"late": {"times": [10.0, 12.0]}},
                "path": {"frames": {"paths": ["a.jpg"]}},
            },
            folder=None,
        )
        assert registry.keys() == ["early", "frames", "late"]
        assert "early" in registry and "missing" not in registry
        assert registry.resolve("late").image_times == [10.0, 12.0]
        assert registry.get("missing") is None
        with pytest.raises(KeyError):
            registry.resolve("missing")


class TestRestorationConfigAndBuilder:
    def test_tvd_config(self, tmp_path):
        from darsia_tpu.presets.workflows.config.restoration import (
            RestorationConfig,
        )

        toml = tmp_path / "c.toml"
        toml.write_text(
            "[restoration]\n"
            'method = "tvd"\n'
            "weight = 0.05\n"
            "max_num_iter = 20\n"
        )
        cfg = RestorationConfig().load(toml)
        assert cfg.method == "tvd"
        assert cfg.options.weight == pytest.approx(0.05)

    def test_none_method(self, tmp_path):
        from darsia_tpu.presets.workflows.config.restoration import (
            RestorationConfig,
        )

        toml = tmp_path / "c.toml"
        toml.write_text('[restoration]\nmethod = "none"\n')
        cfg = RestorationConfig().load(toml)
        assert cfg.method is None

    def test_build_restoration(self, tmp_path):
        from darsia_tpu.presets.workflows.config.restoration import (
            RestorationConfig,
        )
        from darsia_tpu.presets.workflows.restoration import build_restoration

        class Rig:
            baseline = da.OpticalImage(
                np.zeros((16, 16, 3), np.float32), width=1.0, height=1.0
            )
            labels = None

        toml = tmp_path / "c.toml"
        toml.write_text(
            "[restoration]\n"
            'method = "tvd"\n'
            "weight = 0.05\n"
            "max_num_iter = 5\n"
        )
        restoration = build_restoration(RestorationConfig().load(toml), Rig())
        assert restoration is not None
        assert build_restoration(None, Rig()) is None


class TestWorkflowUtilsConfig:
    def test_load(self, tmp_path):
        from darsia_tpu.presets.workflows.config.workflow_utils import (
            WorkflowUtilsConfig,
        )

        toml = tmp_path / "c.toml"
        toml.write_text(
            "[utils]\n"
            'export_calibration_bundle = "/tmp/bundle.zip"\n'
        )
        cfg = WorkflowUtilsConfig().load(toml)
        assert cfg.export_calibration_bundle == Path("/tmp/bundle.zip")
        assert cfg.import_calibration_bundle is None


class TestHelperConfig:
    def test_results_section(self, tmp_path):
        from darsia_tpu.presets.workflows.config.helper import HelperConfig

        toml = tmp_path / "c.toml"
        toml.write_text(
            "[helper.results]\n"
            'mode = "rescaled_mass"\n'
            'format = "csv"\n'
        )
        cfg = HelperConfig().load(toml)
        assert cfg.results is not None
        assert cfg.results.mode == "rescaled_mass"
        assert cfg.results.format == "csv"
        assert cfg.roi is None


class TestImagePorosityConfig:
    def test_load_and_defaults(self, tmp_path):
        from darsia_tpu.presets.workflows.config.image_porosity import (
            ImagePorosityConfig,
        )

        toml = tmp_path / "c.toml"
        toml.write_text(
            "[image_porosity]\n"
            'mode = "from_image"\n'
            "tol = 0.8\n"
        )
        cfg = ImagePorosityConfig().load(toml)
        assert cfg.mode == "from_image"
        assert cfg.tol == pytest.approx(0.8)
        assert cfg.patches == (1, 1)


class TestProtocolPreview:
    def test_preview_conflicts(self, tmp_path):
        from darsia_tpu.presets.workflows.setup.setup_protocols import (
            preview_protocol_setup_conflicts,
        )

        results = tmp_path / "results"
        (results / "protocols").mkdir(parents=True)
        (tmp_path / "base.jpg").touch()
        toml = tmp_path / "c.toml"
        toml.write_text(
            "\n".join(
                [
                    "[data]",
                    f'folder = "{tmp_path}"',
                    'baseline = "base.jpg"',
                    f'results = "{results}"',
                    "[protocol]",
                ]
            )
        )
        # No protocol files yet -> no conflicts.
        assert preview_protocol_setup_conflicts(toml) == []


class TestScalarProducts:
    def _result(self):
        meta = {"width": 1.0, "height": 1.0, "scalar": True}
        field = da.ScalarImage(np.full((4, 4), 0.5, np.float32), **meta)
        return da.SimpleMassAnalysisResults(
            time=None,
            mass=field,
            mass_g=field,
            mass_aq=field,
            saturation_g=field,
            color_signal=field,
            concentration_aq=field,
        )

    def test_base_products(self):
        from darsia_tpu.presets.workflows.analysis.scalar_products import (
            analysis_scalar_products,
        )

        products, rescaled = analysis_scalar_products(
            mass_analysis_result=self._result()
        )
        assert rescaled is None
        assert set(products) >= {
            "mass",
            "mass_total",
            "mass_g",
            "mass_aq",
            "saturation_g",
            "concentration_aq",
        }

    def test_rescaled_requires_dependencies(self):
        from darsia_tpu.presets.workflows.analysis.scalar_products import (
            analysis_scalar_products,
        )

        with pytest.raises(ValueError):
            analysis_scalar_products(
                mass_analysis_result=self._result(),
                requested_modes={"rescaled_mass"},
            )

    def test_simple_alias(self):
        from darsia_tpu.multiphase.mass_analysis import (
            MassAnalysisResults,
            SimpleMassAnalysisResults,
        )

        assert SimpleMassAnalysisResults is MassAnalysisResults


class TestSimpleSegmentation:
    def test_extract_mask_mass_mode(self):
        from darsia_tpu.presets.workflows.segmentation_contours import (
            SimpleSegmentation,
        )

        meta = {"width": 1.0, "height": 1.0, "scalar": True}
        field = da.ScalarImage(
            np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4), **meta
        )
        result = da.SimpleMassAnalysisResults(
            time=None,
            mass=field,
            mass_g=field,
            mass_aq=field,
            saturation_g=field,
            color_signal=field,
            concentration_aq=field,
        )
        seg = SimpleSegmentation("mass", 0.5)
        mask = seg.extract_mask(None, mass_analysis_result=result)
        assert mask.dtype == bool
        assert 0 < mask.sum() < 16


class TestLabelColorSpectrumMap:
    def test_save_load_roundtrip(self, tmp_path):
        from darsia_tpu.signals.color.color_range import ColorSpectrum
        from darsia_tpu.signals.color.label_maps import LabelColorSpectrumMap

        rng = np.random.default_rng(0)
        mapping = LabelColorSpectrumMap()
        for label in (0, 3):
            mapping[label] = ColorSpectrum(resolution=4).fit(rng.random((20, 3)))
        mapping.save(tmp_path / "spectra")
        loaded = LabelColorSpectrumMap.load(tmp_path / "spectra")
        assert sorted(loaded) == [0, 3]
        assert loaded[3].resolution == 4


class TestCalibrationMetadata:
    def test_read_missing_and_present(self, tmp_path):
        from darsia_tpu.presets.workflows.calibration.metadata import (
            _METADATA_NAME,
            read_calibration_metadata,
        )

        assert read_calibration_metadata(tmp_path) is None
        (tmp_path / _METADATA_NAME).write_text(json.dumps({"basis": "labels"}))
        assert read_calibration_metadata(tmp_path) == {"basis": "labels"}


class TestSelectImagePaths:
    def test_explicit_paths(self, tmp_path):
        from darsia_tpu.presets.workflows.analysis.analysis_context import (
            select_image_paths,
        )

        for name in ("a.jpg", "b.jpg"):
            (tmp_path / name).touch()

        class Data:
            folder = tmp_path
            results = tmp_path

        class Config:
            data = Data()

        class Experiment:
            def find_images_for_paths(self, paths):
                return paths

            def iter_available(self, paths):
                return paths

        import types

        from darsia_tpu.presets.workflows.config import TimeData

        selection = TimeData()
        selection.image_paths = [Path("a.jpg"), Path("b.jpg")]
        sub = types.SimpleNamespace(data=selection)
        paths = select_image_paths(
            Config(), Experiment(), all=False, sub_config=sub
        )
        assert [Path(p).name for p in paths] == ["a.jpg", "b.jpg"]
        # all=True falls back to the full data pool.
        pool = select_image_paths(
            types.SimpleNamespace(
                data=types.SimpleNamespace(data=[Path("c.jpg")])
            ),
            Experiment(),
            all=True,
        )
        assert [Path(p).name for p in pool] == ["c.jpg"]


class TestPathUnit:
    def test_namedtuple(self):
        from darsia_tpu.analysis.skeleton_analysis import PathUnit

        unit = PathUnit(time=1.5, id=2, position=(3, 4))
        assert unit.time == 1.5 and unit.id == 2 and unit.position == (3, 4)


class TestSetupIllustrations:
    def test_scalar_and_discrete_maps(self, tmp_path):
        from darsia_tpu.presets.workflows.setup.illustrations import (
            save_discrete_map_illustration,
            save_scalar_map_illustration,
        )

        depth = np.linspace(0, 0.02, 48, dtype=np.float32).reshape(6, 8)
        out = save_scalar_map_illustration(
            depth, tmp_path / "depth.png", title="depth", colorbar_label="m"
        )
        assert out.exists() and out.stat().st_size > 0

        labels = np.array([[0, 1], [1, 2]], dtype=np.int32)
        out2 = save_discrete_map_illustration(
            labels, tmp_path / "labels.jpg", title="labels"
        )
        assert out2.exists() and out2.stat().st_size > 0

    def test_rejects_non_2d(self, tmp_path):
        from darsia_tpu.presets.workflows.setup.illustrations import (
            save_scalar_map_illustration,
        )

        with pytest.raises(ValueError):
            save_scalar_map_illustration(
                np.zeros((2, 2, 3)), tmp_path / "bad.png"
            )
