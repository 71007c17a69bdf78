"""Tests for the TOML workflow config system
(darsia_tpu.presets.workflows.config)."""

import numpy as np
import pytest

from darsia_tpu.presets.workflows.config import (
    AnalysisConfig,
    ColorEmbeddingRegistry,
    CorrectionsConfig,
    DataConfig,
    FluidFlowerConfig,
    FormatRegistry,
    RigConfig,
    RoiRegistry,
    TimeData,
    convert_to_hours,
    deep_merge,
)
from darsia_tpu.presets.workflows.mode_resolution import (
    mode_requires_color_to_mass,
    validate_mode_syntax,
)


BASE_TOML = """
[data]
folder = "{folder}"
baseline = "baseline.jpg"
results = "{results}"

[rig]
width = 2.8
height = 1.5
dim = 2

[roi.boxA]
corner_1 = [0.0, 0.0]
corner_2 = [1.0, 1.0]

[roi.boxB]
corner_1 = [1.0, 0.5]
corner_2 = [2.0, 1.5]
label = 3

[color.path.co2]
mode = "relative"
num_segments = 2

[format.jpg.thumb]
name = "stem_hh-mm"
resolution = [100, 200]

[analysis]
formats = ["thumb"]

[analysis.mass]
color = "co2"
roi = ["boxA"]
export = ["mass"]
"""


@pytest.fixture
def config_file(tmp_path):
    folder = tmp_path / "images"
    folder.mkdir()
    (folder / "baseline.jpg").write_bytes(b"")
    results = tmp_path / "results"
    toml = tmp_path / "config.toml"
    toml.write_text(BASE_TOML.format(folder=folder, results=results))
    return toml


def test_convert_to_hours():
    assert convert_to_hours(1.5) == 1.5
    assert convert_to_hours("01:30:00") == 1.5
    assert convert_to_hours("1:00:30:00") == 24.5
    assert convert_to_hours("02:30") == 2.5
    with pytest.raises(ValueError):
        convert_to_hours("1:2:3:4:5")


def test_deep_merge():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    deep_merge(base, {"a": {"y": 20, "z": 30}, "c": 4})
    assert base == {"a": {"x": 1, "y": 20, "z": 30}, "b": 3, "c": 4}


def test_time_data_selection():
    td = TimeData().load(
        {
            "times": [0.5],
            "interval": {"mid": {"start": 1.0, "end": 2.0, "num": 3}},
            "window": {"late": {"start": 9.5, "end": 11.0}},
        }
    )
    assert td.all_times() == [0.5, 1.0, 1.5, 2.0]
    available = [0.0, 0.5, 1.5, 5.0, 10.0]
    assert td.select(available) == [1, 2, 4]


def test_fluidflower_config_aggregation(config_file, recwarn):
    cfg = FluidFlowerConfig(config_file)
    assert cfg.rig.width == 2.8 and cfg.rig.dim == 2
    assert cfg.data.baseline.name == "baseline.jpg"
    assert set(cfg.roi_registry.keys()) == {"boxA", "boxB"}
    assert "co2" in cfg.color
    assert cfg.analysis.mass.export == ["mass"]
    assert list(cfg.analysis.mass.roi) == ["boxA"]
    assert cfg.format_registry["thumb"].resolution == (100, 200)
    # Missing sections are None + warned, and check() flags them.
    assert cfg.depth is None
    with pytest.raises(ValueError, match="depth"):
        cfg.check("depth")
    cfg.check("data", "rig", "analysis")


def test_labeled_roi_autotyping(config_file):
    cfg = FluidFlowerConfig(config_file)
    registry = cfg.roi_registry
    assert registry["boxB"].label == 3
    with pytest.raises(TypeError):
        registry.resolve_rois(["boxB"])
    with pytest.raises(TypeError):
        registry.resolve_roi_and_labels(["boxA"])


def test_mass_unknown_embedding_rejected(tmp_path, config_file):
    bad = tmp_path / "bad.toml"
    bad.write_text(
        config_file.read_text().replace('color = "co2"', 'color = "nope"')
    )
    # A dangling embedding reference fails loudly (ValueError), it is not
    # silently treated as a missing section.
    with pytest.raises(ValueError, match="nope"):
        FluidFlowerConfig(bad)


def test_mode_resolution():
    validate_mode_syntax("mass")
    validate_mode_syntax("rescaled_mass")
    with pytest.raises(ValueError):
        validate_mode_syntax("bogus")
    assert mode_requires_color_to_mass("saturation_g")
    assert not mode_requires_color_to_mass("bogus")


def test_format_name_rendering(config_file):
    cfg = FluidFlowerConfig(config_file)
    fmt = cfg.format_registry["thumb"]
    assert fmt.render_name("img_007", 26.75) == "img_007_02-45"


def test_multi_file_merge(tmp_path, config_file):
    override = tmp_path / "override.toml"
    override.write_text("[rig]\nwidth = 9.9\nheight = 1.5\ndim = 2\n")
    cfg = FluidFlowerConfig([config_file, override])
    assert cfg.rig.width == 9.9
