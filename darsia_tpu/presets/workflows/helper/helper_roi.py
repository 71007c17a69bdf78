"""ROI helper: visualize/inspect configured ROIs on the baseline.

Parity: reference ``presets/workflows/helper/{helper_roi,
helper_roi_viewer}.py`` (interactive picker becomes assistants +
rendered overview images).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils.roi_visualization import build_active_mask_from_rois

logger = logging.getLogger(__name__)

__all__ = ["helper_roi_viewer", "helper_roi"]


def helper_roi_viewer(path, cls=None, keys: Optional[list] = None) -> Path:
    """Render all (or selected) registered ROIs over the baseline."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..analysis.analysis_context import prepare_analysis_context
    from ..rig import Rig
    from ..utils.roi_visualization import draw_active_region

    ctx = prepare_analysis_context(cls=cls or Rig, path=path, section="helper")
    registry = ctx.config.roi_registry
    assert registry is not None, "No [roi.*] entries configured."
    selected = registry.resolve(keys or registry.keys())
    mask = build_active_mask_from_rois(selected, ctx.fluidflower.baseline)
    out = Path(ctx.config.data.results) / "helper" / "roi_overview.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots()
    draw_active_region(
        ax, ctx.fluidflower.baseline, mask, title="Registered ROIs"
    )
    fig.savefig(out, dpi=200, bbox_inches="tight")
    plt.close(fig)
    logger.info("ROI overview written to %s.", out)
    return out


def helper_roi(path, cls=None, points: Optional[list] = None) -> dict:
    """Define a new ROI from two points (headless counterpart of the
    interactive picker) and print the TOML snippet."""
    from ....assistants.selection_assistants import SubregionAssistant
    from ..analysis.analysis_context import prepare_analysis_context
    from ..rig import Rig

    ctx = prepare_analysis_context(cls=cls or Rig, path=path, section="helper")
    baseline = ctx.fluidflower.baseline
    if points is not None:
        coords = np.asarray(
            [np.asarray(baseline.coordinatesystem.coordinate(p)) for p in points]
        )
    else:
        coords = SubregionAssistant(baseline)()
    snippet = (
        "[roi.new_roi]\n"
        f"name = \"new_roi\"\n"
        f"corner_1 = [{coords[0][0]:.4f}, {coords[0][1]:.4f}]\n"
        f"corner_2 = [{coords[1][0]:.4f}, {coords[1][1]:.4f}]\n"
    )
    print(snippet)
    return {"corner_1": coords[0].tolist(), "corner_2": coords[1].tolist()}
