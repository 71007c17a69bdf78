"""Color explorer helper: inspect color statistics of image regions.

Parity: reference ``presets/workflows/helper/helper_color.py:24-260``.
The matplotlib slider UI becomes a programmatic report; pass a box to
inspect, get channel histograms and HSV/LAB statistics back.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np

from ....ops.color import convert_trichromatic

logger = logging.getLogger(__name__)

__all__ = ["color_report", "launch_color_helper", "helper_color"]


def color_report(image, box: Optional[tuple] = None) -> dict:
    """Channel statistics of a region in RGB / HSV / LAB."""
    import jax.numpy as jnp

    data = np.asarray(image.img if hasattr(image, "img") else image, float)
    if data.max() > 1.5:
        data = data / 255.0
    if box is not None:
        data = data[box]
    report = {}
    for space in ("RGB", "HSV", "LAB"):
        converted = np.asarray(
            convert_trichromatic(jnp.asarray(data, jnp.float32), "RGB", space)
        )
        report[space] = {
            "mean": converted.reshape(-1, 3).mean(axis=0).tolist(),
            "std": converted.reshape(-1, 3).std(axis=0).tolist(),
            "min": converted.reshape(-1, 3).min(axis=0).tolist(),
            "max": converted.reshape(-1, 3).max(axis=0).tolist(),
        }
    return report


def launch_color_helper(
    image, boxes: Optional[list] = None, path: Optional[Path] = None
):
    """Report color statistics for given boxes; save histograms if path."""
    boxes = boxes or [None]
    reports = [color_report(image, box) for box in boxes]
    for i, report in enumerate(reports):
        logger.info("box %d RGB mean: %s", i, report["RGB"]["mean"])
    if path is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        data = np.asarray(
            image.img if hasattr(image, "img") else image, float
        )
        if data.max() > 1.5:
            data = data / 255.0
        fig, axes = plt.subplots(1, 3, figsize=(12, 3))
        for c, (ax, name) in enumerate(zip(axes, "RGB")):
            ax.hist(data[..., c].ravel(), bins=64, color=name.lower())
            ax.set_title(name)
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return reports


def helper_color(path, cls=None, boxes: Optional[list] = None):
    """Workflow entry: color report on the corrected baseline."""
    from ..analysis.analysis_context import prepare_analysis_context
    from ..rig import Rig

    ctx = prepare_analysis_context(cls=cls or Rig, path=path, section="helper")
    out = Path(ctx.config.data.results) / "helper" / "color_histograms.png"
    return launch_color_helper(ctx.fluidflower.baseline, boxes=boxes, path=out)
