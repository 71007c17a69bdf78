"""Volume analysis workflow step: gas volume per ROI over time.

Parity: reference ``presets/workflows/analysis/analysis_volume.py:29-300``.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from .analysis_context import AnalysisContext, prepare_analysis_context, iter_prefetched_images
from .progress import publish_image_progress, publish_step_complete, publish_step_start

logger = logging.getLogger(__name__)

__all__ = ["analysis_volume_from_context", "analysis_volume"]


def analysis_volume_from_context(
    ctx: AnalysisContext,
    show: bool = False,
    stream_callback: Optional[Callable] = None,
    progress_callback: Optional[Callable] = None,
):
    import pandas as pd

    config = ctx.config
    fluidflower = ctx.fluidflower
    assert config.analysis is not None
    assert ctx.color_to_mass_analysis is not None
    volume_config = config.analysis.volume
    rois = volume_config.roi if volume_config is not None else {}
    folder = (
        Path(volume_config.folder)
        if volume_config is not None
        else Path(config.data.results) / "volume"
    )
    folder.mkdir(parents=True, exist_ok=True)
    csv_path = folder / "volume_analysis_results.csv"
    df = pd.read_csv(csv_path) if csv_path.exists() else pd.DataFrame()

    geometry = {
        (roi.name or key): fluidflower.geometry.subregion(roi.roi)
        for key, roi in rois.items()
    }

    publish_step_start(
        progress_callback, step="volume", image_total=len(ctx.image_paths)
    )
    started = time.monotonic()
    for index, path, img in iter_prefetched_images(ctx):
        t0 = time.monotonic()
        if img is None:
            continue
        result = ctx.color_to_mass_analysis(img)
        saturation = result.saturation_g
        row = {
            "time": float(np.asarray(result.time))
            if result.time is not None
            else None,
            "image_stem": path.stem,
            "volume_g_total": float(
                fluidflower.geometry.integrate(saturation)
            ),
        }
        for key, roi in rois.items():
            name = roi.name or key
            row[f"{name}_volume_g"] = float(
                geometry[name].integrate(saturation.subregion(roi.roi))
            )
        df = pd.concat([df, pd.DataFrame([row])], ignore_index=True)
        df.sort_values(by="time", inplace=True)
        df.to_csv(csv_path, index=False)
        publish_image_progress(
            progress_callback,
            step="volume",
            image_path=str(path),
            image_index=index,
            image_total=len(ctx.image_paths),
            image_duration_s=time.monotonic() - t0,
        )
    publish_step_complete(
        progress_callback,
        step="volume",
        step_elapsed_s=time.monotonic() - started,
    )
    return df


def analysis_volume(path, cls=None, all: bool = False, **kwargs):
    from ..rig import Rig

    ctx = prepare_analysis_context(
        cls=cls or Rig, path=path, all=all, require_color_to_mass=True
    )
    return analysis_volume_from_context(ctx, **kwargs)
