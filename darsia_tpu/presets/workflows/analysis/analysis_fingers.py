"""Finger-detection workflow step.

Parity: reference ``presets/workflows/analysis/analysis_fingers.py:109-1046``.
The compact core: threshold the configured mode within each ROI, extract
the main contour, count finger tips (local extrema) and track contour
length over time; CSV + overlay output.  The reference's path-evolution
bookkeeping is covered by :class:`darsia_tpu.PathEvolutionAnalysis`.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from ....analysis.contouranalysis import ContourAnalysis, contour_length
from ....analysis.skeleton_analysis import PathEvolutionAnalysis
from ..mode_resolution import mode_requires_color_to_mass
from ..segmentation_contours import SimpleSegmentation
from .analysis_context import AnalysisContext, prepare_analysis_context
from .progress import publish_image_progress, publish_step_complete, publish_step_start

logger = logging.getLogger(__name__)

__all__ = ["analysis_fingers_from_context", "analysis_fingers"]


def _roi_slices(roi_config, image) -> tuple:
    voxels = np.asarray(
        image.coordinatesystem.voxel(np.asarray(roi_config.roi, dtype=float))
    )
    lo = np.minimum(voxels[0], voxels[1]).astype(int)
    hi = np.maximum(voxels[0], voxels[1]).astype(int)
    return (slice(max(lo[0], 0), hi[0]), slice(max(lo[1], 0), hi[1]))


def analysis_fingers_from_context(
    ctx: AnalysisContext,
    show: bool = False,
    stream_callback: Optional[Callable] = None,
    progress_callback: Optional[Callable] = None,
):
    import pandas as pd

    config = ctx.config
    assert config.analysis is not None and config.analysis.fingers is not None
    fingers_cfg = config.analysis.fingers.config
    if isinstance(fingers_cfg, dict):
        entries = fingers_cfg
    else:
        entries = {"default": fingers_cfg}
    folder = Path(config.analysis.fingers.folder)
    folder.mkdir(parents=True, exist_ok=True)
    csv_path = folder / "fingers_analysis_results.csv"
    df = pd.read_csv(csv_path) if csv_path.exists() else pd.DataFrame()
    # Per-(entry, roi) path-evolution trackers for skeleton analysis.
    evolutions: dict = {}

    publish_step_start(
        progress_callback, step="fingers", image_total=len(ctx.image_paths)
    )
    started = time.monotonic()
    for index, path in enumerate(ctx.image_paths, start=1):
        t0 = time.monotonic()
        path = Path(path)
        img = ctx.fluidflower.read_image(path)
        mass_result = None
        for key, entry in entries.items():
            if (
                mode_requires_color_to_mass(entry.mode)
                and mass_result is None
            ):
                assert ctx.color_to_mass_analysis is not None, (
                    "Fingers mode requires color-to-mass analysis."
                )
                mass_result = ctx.color_to_mass_analysis(img)
            segmentation = SimpleSegmentation(entry.mode, entry.threshold)
            mask = segmentation.extract_mask(
                img,
                mass_analysis_result=mass_result,
                color_embedding_registry=config.color,
                color_embedding_runtime=ctx.color_embedding_runtime,
            )
            rois = entry.roi or {"full": None}
            for roi_key, roi_config in rois.items():
                sub_mask = (
                    mask
                    if roi_config is None
                    else mask[_roi_slices(roi_config, img)]
                )
                if entry.fill_holes:
                    from scipy import ndimage

                    sub_mask = ndimage.binary_fill_holes(sub_mask)
                analysis = ContourAnalysis()
                analysis.load_labels(sub_mask)
                peaks, _ = analysis.local_extrema()
                row = {
                    "time": float(np.asarray(img.time))
                    if img.time is not None
                    else None,
                    "image_stem": path.stem,
                    "entry": key,
                    "roi": roi_key,
                    "contour_length": float(contour_length(sub_mask)),
                    "number_fingers": int(len(peaks)),
                    "area_fraction": float(np.asarray(sub_mask).mean()),
                }
                if entry.include_skeleton_analysis:
                    tracker = evolutions.setdefault(
                        (key, roi_key), PathEvolutionAnalysis()
                    )
                    record = tracker.add(sub_mask, time=row["time"])
                    row["skeleton_length"] = record.get("skeleton_length")
                    row["number_tips"] = record.get("num_fingers")
                    row["skeleton_growth"] = record.get("length_growth")
                df = pd.concat([df, pd.DataFrame([row])], ignore_index=True)
        df.to_csv(csv_path, index=False)
        publish_image_progress(
            progress_callback,
            step="fingers",
            image_path=str(path),
            image_index=index,
            image_total=len(ctx.image_paths),
            image_duration_s=time.monotonic() - t0,
        )
    publish_step_complete(
        progress_callback,
        step="fingers",
        step_elapsed_s=time.monotonic() - started,
    )
    return df


def analysis_fingers(path, cls=None, all: bool = False, **kwargs):
    from ..rig import Rig

    ctx = prepare_analysis_context(
        cls=cls or Rig, path=path, all=all, require_color_to_mass=True
    )
    return analysis_fingers_from_context(ctx, **kwargs)
