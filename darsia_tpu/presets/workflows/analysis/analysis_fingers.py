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
    # Reference-schema statistics (ref analysis_fingers.py:212-226, 940-987).
    stats_path = folder / "statistics.csv"
    stats_df = pd.read_csv(stats_path) if stats_path.exists() else pd.DataFrame()
    # Per-(entry, roi, category) path-evolution trackers: "peak" = contour
    # local maxima, "leaf" = skeleton endpoints, "junction" = skeleton
    # branch points (reference categories, analysis_fingers.py:228-233).
    evolutions: dict = {}
    last_mask: dict = {}

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
                peaks, fjords = analysis.local_extrema()
                img_time = (
                    float(np.asarray(img.time)) if img.time is not None else None
                )
                step_time = img_time if img_time is not None else float(index)
                row = {
                    "time": img_time,
                    "image_stem": path.stem,
                    "entry": key,
                    "roi": roi_key,
                    "contour_length": float(contour_length(sub_mask)),
                    "number_fingers": int(len(peaks)),
                    "area_fraction": float(np.asarray(sub_mask).mean()),
                }

                # ROI width -> finger frequency/wavelength (ref :357-364).
                if roi_config is not None:
                    roi_arr = np.asarray(roi_config.roi, dtype=float)
                    roi_width = float(abs(roi_arr[1, 0] - roi_arr[0, 0]))
                else:
                    roi_width = float(
                        np.asarray(sub_mask).shape[1]
                        * float(np.mean(img.voxel_size[:2]))
                    )
                frequency = len(peaks) / roi_width if roi_width > 0 else 0.0
                wavelength = (
                    roi_width / len(peaks) if len(peaks) > 0 else 0.0
                )

                # Identity-tracked finger categories.
                trackers = evolutions.setdefault(
                    (key, roi_key),
                    {
                        "peak": PathEvolutionAnalysis(),
                        "leaf": PathEvolutionAnalysis(),
                        "junction": PathEvolutionAnalysis(),
                    },
                )
                trackers["peak"].add(np.asarray(peaks), time=step_time)
                skeleton_record = trackers["leaf"].add_mask(
                    sub_mask, time=step_time
                )
                from ....analysis.skeleton_analysis import SkeletonAnalysis

                skel = SkeletonAnalysis()
                skel.load(sub_mask)
                trackers["junction"].add(skel.branch_points(), time=step_time)

                num_paths = {}
                for category, tracker in trackers.items():
                    tracker.find_paths(reset=True)
                    num_paths[category] = tracker.path_counts(
                        tracker.total_time - 1
                    )

                stats_row = {
                    "time": img_time,
                    "key": roi_key,
                    "image": path.stem,
                    "contour_length": row["contour_length"],
                    "number_tips": int(len(peaks)),
                    "number_fjords": int(len(fjords)),
                    "number_skeleton_leaves": skeleton_record["num_fingers"],
                    "number_skeleton_junctions": skeleton_record[
                        "num_junctions"
                    ],
                    "roi_width": roi_width,
                    "finger_frequency": frequency,
                    "finger_wavelength": wavelength,
                    # Per-category identity statistics (ref :940-980).
                    "number_fingers": num_paths["peak"]["active"],
                    "number_new_fingers": num_paths["peak"]["new"],
                    "number_continuing_fingers": num_paths["peak"][
                        "continuing"
                    ],
                    "number_ending_fingers": num_paths["peak"]["ending"],
                    "number_new_skeleton_leaves": num_paths["leaf"]["new"],
                    "number_continuing_skeleton_leaves": num_paths["leaf"][
                        "continuing"
                    ],
                    "number_ending_skeleton_leaves": num_paths["leaf"][
                        "ending"
                    ],
                    "number_splitting_fingers": num_paths["junction"][
                        "active"
                    ],
                    "number_new_splitting_fingers": num_paths["junction"][
                        "new"
                    ],
                    "number_continuing_splitting_fingers": num_paths[
                        "junction"
                    ]["continuing"],
                    "number_ending_splitting_fingers": num_paths["junction"][
                        "ending"
                    ],
                }
                stats_df = pd.concat(
                    [stats_df, pd.DataFrame([stats_row])], ignore_index=True
                )
                last_mask[(key, roi_key)] = np.asarray(sub_mask)

                if entry.include_skeleton_analysis:
                    row["skeleton_length"] = skeleton_record.get(
                        "skeleton_length"
                    )
                    row["number_tips"] = skeleton_record.get("num_fingers")
                    row["skeleton_growth"] = skeleton_record.get(
                        "length_growth"
                    )
                df = pd.concat([df, pd.DataFrame([row])], ignore_index=True)
        df.to_csv(csv_path, index=False)
        stats_df.to_csv(stats_path, index=False)
        publish_image_progress(
            progress_callback,
            step="fingers",
            image_path=str(path),
            image_index=index,
            image_total=len(ctx.image_paths),
            image_duration_s=time.monotonic() - t0,
        )
    # Per-(entry, roi) path plots + advance-rate exports (ref :422-515: the
    # reference writes per-image path overlays; one final overlay per ROI
    # carries the same information at a fraction of the IO).
    for (key, roi_key), trackers in evolutions.items():
        mask = last_mask.get((key, roi_key))
        if mask is None:
            continue
        plot_dir = folder / "paths" / key
        plot_dir.mkdir(parents=True, exist_ok=True)
        for category, tracker in trackers.items():
            if tracker.total_time == 0:
                continue
            try:
                tracker.plot_paths(
                    img=mask.astype(float),
                    path=plot_dir / f"{roi_key}_{category}_paths.png",
                )
            except Exception as exc:  # plotting must not fail the analysis
                logger.warning("Path plot failed for %s/%s: %s", key, roi_key, exc)
        rates = trackers["peak"].advance_rates()
        if rates:
            pd.DataFrame(rates).to_csv(
                plot_dir / f"{roi_key}_advance_rates.csv", index=False
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
