"""Color-path calibration workflow step.

Parity: reference
``presets/workflows/calibration/calibration_color_paths.py:25-280``:
baseline spectra -> calibration spectra (baseline spectrum ignored) ->
per-label path regression -> persist LabelColorPathMap + metadata.
"""

from __future__ import annotations

import logging
from pathlib import Path
from types import SimpleNamespace
from typing import Optional

import numpy as np

from ....signals.color import (
    ColorPathEmbedding,
    LabelColorPathMapRegression,
)
from ....utils.standard_images import roi_to_mask
from ..analysis.analysis_context import (
    AnalysisContext,
    prepare_analysis_context,
    select_image_paths,
)
from .metadata import write_calibration_metadata

logger = logging.getLogger(__name__)

__all__ = [
    "calibration_color_paths_from_context",
    "calibration_color_paths",
    "collect_existing_calibration_paths_to_delete",
    "delete_calibration",
]


def calibration_color_paths_from_context(
    ctx: AnalysisContext, show: bool = False
) -> None:
    config = ctx.config
    experiment = ctx.experiment
    fluidflower = ctx.fluidflower
    config.check("rig", "data", "protocol", "color", "calibration")
    assert config.calibration is not None and config.calibration.color is not None
    embedding = config.calibration.color.color
    if not isinstance(embedding, ColorPathEmbedding):
        raise NotImplementedError(
            "calibration.color currently supports only color path embeddings."
        )

    labels = embedding.get_labels(fluidflower)

    # Baseline + calibration images through the correction chain.
    baseline_paths = (
        select_image_paths(
            config,
            experiment,
            sub_config=SimpleNamespace(data=embedding.baseline_data),
        )
        if embedding.baseline_data is not None
        else []
    )
    baseline_images = [fluidflower.read_image(p) for p in baseline_paths]
    calibration_images = [
        fluidflower.read_image(p) for p in ctx.image_paths
    ]

    # Calibration mask: boolean porosity, optionally restricted to ROIs.
    calibration_mask = fluidflower.boolean_porosity.copy()
    if embedding.rois and config.roi_registry is not None:
        roi_entries = config.roi_registry.resolve_rois(embedding.rois)
        union = roi_to_mask(
            [entry.roi for entry in roi_entries.values()], calibration_mask
        )
        combined = np.asarray(calibration_mask.img) & np.asarray(union.img)
        if not combined.any():
            logger.warning(
                "ROI union does not overlap the porosity mask; using the "
                "full porosity mask."
            )
        else:
            calibration_mask.img = combined

    regression = LabelColorPathMapRegression(
        labels=labels,
        resolution=embedding.resolution,
        mask=calibration_mask,
        ignore_labels=embedding.ignore_labels,
    )

    # Baseline spectrum (colors to ignore during calibration).
    ignore_spectrum = None
    if embedding.ignore_baseline_spectrum != "none" and baseline_images:
        ignore_spectrum = regression.get_color_spectrum(
            baseline_images[1:] or baseline_images,
            baseline=baseline_images[0],
            threshold_zero=embedding.threshold_baseline,
        )
        if embedding.ignore_baseline_spectrum == "expanded":
            ignore_spectrum = regression.expand_color_spectrum(ignore_spectrum)

    baseline = baseline_images[0] if baseline_images else fluidflower.baseline
    spectra = regression.get_color_spectrum(
        calibration_images,
        baseline=baseline,
        ignore=ignore_spectrum,
        threshold_zero=embedding.threshold_calibration,
    )
    color_paths = regression.find_color_path(
        spectra,
        num_segments=embedding.num_segments,
        weighting=embedding.histogram_weighting,
    )
    color_paths.save(embedding.color_paths_folder)
    write_calibration_metadata(
        embedding.color_paths_folder,
        embedding.basis,
        extra={"embedding_id": embedding.embedding_id},
    )
    logger.info(
        "Color paths saved to %s (%d labels).",
        embedding.color_paths_folder,
        len(color_paths),
    )


def calibration_color_paths(path, cls=None, show: bool = False) -> None:
    from ..rig import Rig

    ctx = prepare_analysis_context(
        cls=cls or Rig, path=path, section="calibration"
    )
    calibration_color_paths_from_context(ctx, show=show)


def collect_existing_calibration_paths_to_delete(path) -> list:
    """All persisted calibration artifacts under results/calibration."""
    from ..config.fluidflower_config import FluidFlowerConfig

    config = FluidFlowerConfig(path, require_data=False, require_results=False)
    if config.data is None:
        return []
    root = Path(config.data.results) / "calibration"
    return sorted(p for p in root.rglob("*") if p.is_file())


def delete_calibration(path, dry_run: bool = False) -> list:
    files = collect_existing_calibration_paths_to_delete(path)
    if not dry_run:
        for file in files:
            file.unlink()
    return files
