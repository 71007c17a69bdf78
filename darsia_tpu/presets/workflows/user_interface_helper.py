"""CLI front-end for helper workflows.

Parity: reference ``presets/workflows/user_interface_helper.py``.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from .helper import color_report, helper_color, helper_results, helper_roi_viewer
from .rig import Rig

logger = logging.getLogger(__name__)

__all__ = ["build_parser_for_helper", "run_helper", "preset_helper", "main"]


def build_parser_for_helper() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="FluidFlower helper run.")
    parser.add_argument(
        "--config", type=str, nargs="+", required=True,
        help="Path(s) to TOML config file(s).",
    )
    parser.add_argument(
        "--results", action="store_true",
        help="Re-export saved analysis fields per [helper.results].",
    )
    parser.add_argument(
        "--roi-viewer", action="store_true",
        help="Render all registered ROIs over the baseline.",
    )
    parser.add_argument(
        "--color", action="store_true",
        help="Color statistics + histograms of the corrected baseline.",
    )
    parser.add_argument("--show", action="store_true", help="Show plots.")
    return parser


def run_helper(rig_cls=Rig, args=None) -> None:
    config_paths = [Path(p) for p in args.config]
    path = config_paths if len(config_paths) > 1 else config_paths[0]
    if args.results:
        helper_results(path, cls=rig_cls, show=args.show)
    if args.roi_viewer:
        helper_roi_viewer(path, cls=rig_cls)
    if args.color:
        helper_color(path, cls=rig_cls)


def main(argv=None) -> None:
    from ...utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    parser = build_parser_for_helper()
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    run_helper(Rig, args)


def preset_helper(rig_cls, **kwargs):
    """Reference-named CLI entry point (reference
    user_interface_helper.py's preset_helper): parse ``sys.argv`` and run
    the helper front-end for a user-supplied Rig subclass."""
    parser = build_parser_for_helper()
    args = parser.parse_args()
    run_helper(rig_cls, args, **kwargs)


if __name__ == "__main__":
    main()
