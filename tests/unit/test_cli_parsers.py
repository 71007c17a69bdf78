"""Tests for the CLI front-end parsers."""

import pytest

from darsia_tpu.presets.workflows.user_interface_analysis import (
    build_parser_for_analysis,
    print_help_for_flags,
)
from darsia_tpu.presets.workflows.user_interface_calibration import (
    build_parser_for_calibration,
)
from darsia_tpu.presets.workflows.user_interface_comparison import (
    build_parser_for_comparison,
)
from darsia_tpu.presets.workflows.user_interface_helper import (
    build_parser_for_helper,
)
from darsia_tpu.presets.workflows.user_interface_setup import (
    build_parser_for_setup,
)
from darsia_tpu.presets.workflows.user_interface_utils import (
    build_parser_for_utils,
)


def test_analysis_parser_flags():
    parser = build_parser_for_analysis()
    args = parser.parse_args(["--config", "a.toml", "b.toml", "--mass", "--all"])
    assert args.config == ["a.toml", "b.toml"]
    assert args.mass and args.all and not args.volume


def test_analysis_info_short_circuits(capsys):
    parser = build_parser_for_analysis()
    args = parser.parse_args(["--config", "a.toml", "--mass", "--info"])
    assert print_help_for_flags(args, parser)
    out = capsys.readouterr().out
    assert "Mass analysis" in out


def test_analysis_requires_config():
    parser = build_parser_for_analysis()
    with pytest.raises(SystemExit):
        parser.parse_args(["--mass"])


def test_setup_parser_flags():
    parser = build_parser_for_setup()
    args = parser.parse_args(
        ["--config", "c.toml", "--rig", "--depth", "--overwrite"]
    )
    assert args.rig and args.depth and args.overwrite and not args.labeling


def test_calibration_parser_flags():
    parser = build_parser_for_calibration()
    args = parser.parse_args(["--config", "c.toml", "--color", "--mass"])
    assert args.color and args.mass


def test_comparison_parser_flags():
    parser = build_parser_for_comparison()
    args = parser.parse_args(
        ["--config", "m.toml", "--wasserstein-compute", "--skip-existing"]
    )
    assert args.wasserstein_compute and args.skip_existing


def test_helper_parser_flags():
    parser = build_parser_for_helper()
    args = parser.parse_args(["--config", "c.toml", "--roi-viewer", "--color"])
    assert args.roi_viewer and args.color


def test_utils_parser_flags():
    parser = build_parser_for_utils()
    args = parser.parse_args(
        ["--config", "c.toml", "--download-data", "--dry-run"]
    )
    assert args.download_data and args.dry_run


def test_unknown_flag_rejected():
    parser = build_parser_for_analysis()
    with pytest.raises(SystemExit):
        parser.parse_args(["--config", "a.toml", "--frobnicate"])
