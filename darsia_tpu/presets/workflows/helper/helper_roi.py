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

__all__ = [
    "helper_roi_viewer",
    "helper_roi",
    "format_roi_template",
    "launch_roi_helper_viewer",
    "launch_roi_viewer",
]


def format_roi_template(corner_1, corner_2) -> str:
    """TOML snippet for a freshly picked ROI (reference
    helper_roi.py:74-80)."""
    return (
        "[roi.roi_name]\n"
        'name = "roi_name"\n'
        f"corner_1 = [{float(corner_1[0]):.8g}, {float(corner_1[1]):.8g}]\n"
        f"corner_2 = [{float(corner_2[0]):.8g}, {float(corner_2[1]):.8g}]\n"
    )


def launch_roi_helper_viewer(
    images: list, *, mode: str, title_prefix: str = "ROI helper"
) -> None:  # pragma: no cover - interactive
    """Interactive frame stepper with a rectangle selector that prints the
    ROI TOML snippet for the selected box (reference helper_roi.py:150-280;
    requires a display)."""
    import matplotlib.pyplot as plt
    from matplotlib.widgets import Button, RectangleSelector

    if len(images) == 0:
        raise ValueError("ROI helper received no images.")

    fig, ax = plt.subplots(figsize=(11, 8))
    plt.subplots_adjust(bottom=0.16)
    state = {"idx": 0}

    def _render() -> None:
        ax.cla()
        img = images[state["idx"]]
        data = np.asarray(img.img if hasattr(img, "img") else img)
        ax.imshow(np.clip(data, 0, 1) if data.ndim == 3 else data)
        ax.set_title(f"{title_prefix} [{mode}] {state['idx'] + 1}/{len(images)}")
        fig.canvas.draw_idle()

    def _on_select(eclick, erelease) -> None:
        img = images[state["idx"]]
        if hasattr(img, "coordinatesystem"):
            c1 = img.coordinatesystem.coordinate(
                [int(eclick.ydata), int(eclick.xdata)]
            )
            c2 = img.coordinatesystem.coordinate(
                [int(erelease.ydata), int(erelease.xdata)]
            )
        else:
            c1, c2 = (eclick.xdata, eclick.ydata), (erelease.xdata, erelease.ydata)
        print(format_roi_template(np.asarray(c1), np.asarray(c2)))

    def _step(delta: int):
        def _go(_event) -> None:
            state["idx"] = (state["idx"] + delta) % len(images)
            _render()

        return _go

    selector = RectangleSelector(ax, _on_select, useblit=True, interactive=True)
    prev_btn = Button(fig.add_axes([0.3, 0.04, 0.1, 0.06]), "Prev")
    next_btn = Button(fig.add_axes([0.6, 0.04, 0.1, 0.06]), "Next")
    prev_btn.on_clicked(_step(-1))
    next_btn.on_clicked(_step(1))
    _render()
    plt.show()
    del selector


def launch_roi_viewer(
    images: list, *, roi_entries: dict, title_prefix: str
) -> None:  # pragma: no cover - interactive
    """Interactive frame stepper rendering the registered ROIs over each
    image (reference helper_roi_viewer.py:66-150; requires a display)."""
    import matplotlib.pyplot as plt
    from matplotlib.widgets import Button

    from ..utils.roi_visualization import draw_active_region

    if len(images) == 0:
        raise ValueError("ROI Viewer received no images.")
    mask = build_active_mask_from_rois(roi_entries, images[0])

    fig, ax = plt.subplots(figsize=(11, 8))
    plt.subplots_adjust(bottom=0.16)
    state = {"idx": 0}

    def _render() -> None:
        ax.cla()
        draw_active_region(
            ax,
            images[state["idx"]],
            mask,
            title=f"{title_prefix} {state['idx'] + 1}/{len(images)}",
        )
        fig.canvas.draw_idle()

    def _step(delta: int):
        def _go(_event) -> None:
            state["idx"] = (state["idx"] + delta) % len(images)
            _render()

        return _go

    prev_btn = Button(fig.add_axes([0.3, 0.04, 0.1, 0.06]), "Prev")
    next_btn = Button(fig.add_axes([0.6, 0.04, 0.1, 0.06]), "Next")
    prev_btn.on_clicked(_step(-1))
    next_btn.on_clicked(_step(1))
    _render()
    plt.show()


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
