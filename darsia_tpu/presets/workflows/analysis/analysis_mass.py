"""Mass analysis workflow step: the per-image hot loop.

Parity: reference ``presets/workflows/analysis/analysis_mass.py:216-400``:
read -> color-to-mass -> rescale to injected mass -> export fields ->
integrate ROIs -> append CSV.
"""

from __future__ import annotations

import logging
import random
import time
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from .analysis_context import AnalysisContext, prepare_analysis_context
from .image_export_formats import ImageExportFormats
from .progress import publish_image_progress, publish_step_complete, publish_step_start
from .scalar_products import analysis_scalar_products
from .streaming import publish_stream_images

logger = logging.getLogger(__name__)

__all__ = ["analysis_mass", "analysis_mass_from_context", "run_mass_analysis"]

_DEFAULT_MASS_EXPORT_MODES = ["mass"]


def analysis_mass_from_context(
    ctx: AnalysisContext,
    show: bool = False,
    stream_callback: Optional[Callable] = None,
    progress_callback: Optional[Callable] = None,
) -> "object":
    """Run the mass hot loop over ctx.image_paths; returns the DataFrame."""
    import pandas as pd

    assert ctx.config.analysis is not None
    assert ctx.color_to_mass_analysis is not None
    config = ctx.config
    experiment = ctx.experiment
    fluidflower = ctx.fluidflower
    color_to_mass_analysis = ctx.color_to_mass_analysis
    co2_mass_analysis = color_to_mass_analysis.co2_mass_analysis
    if config.analysis.mass is None:
        raise ValueError("Mass analysis requires an [analysis.mass] section.")

    # Sub-geometries for ROI integration.
    geometry = {
        roi_config.name or key: fluidflower.geometry.subregion(roi_config.roi)
        for key, roi_config in config.analysis.mass.roi.items()
    }

    export_modes = list(
        config.analysis.mass.export or _DEFAULT_MASS_EXPORT_MODES
    )
    exporter = ImageExportFormats.from_analysis_config(
        config.analysis, config.format_registry
    )
    output_folders = {
        mode: Path(config.analysis.mass.folder) / mode for mode in export_modes
    }
    for folder in output_folders.values():
        folder.mkdir(parents=True, exist_ok=True)
    csv_path = Path(config.analysis.mass.folder) / "mass_analysis_results.csv"
    csv_path.parent.mkdir(parents=True, exist_ok=True)
    mass_df = (
        pd.read_csv(csv_path) if csv_path.exists() else pd.DataFrame()
    )

    image_paths = list(ctx.image_paths)
    if config.analysis.random_traverse:
        random.shuffle(image_paths)

    publish_step_start(
        progress_callback, step="mass", image_total=len(image_paths)
    )
    step_started = time.monotonic()

    from .analysis_context import iter_prefetched_images

    for image_index, path, img in iter_prefetched_images(ctx, image_paths):
        image_started = time.monotonic()
        if img is None:
            continue
        result = color_to_mass_analysis(img)
        image_time = result.time

        products, rescaled = analysis_scalar_products(
            mass_analysis_result=result,
            requested_modes={
                "rescaled_mass",
                "rescaled_saturation_g",
                "rescaled_concentration_aq",
            },
            geometry=fluidflower.geometry,
            injection_protocol=experiment.injection_protocol,
            co2_mass_analysis=co2_mass_analysis,
            date=img.date,
            expert_knowledge_adapter=ctx.expert_knowledge_adapter,
        )
        mass = products["mass_total"]
        mass_g = products["mass_g"]
        mass_aq = products["mass_aq"]

        export_images = dict(products)
        if "extensive_mass" in export_modes:
            export_images["extensive_mass"] = fluidflower.geometry.make_extensive(
                mass
            )
        if "extensive_rescaled_mass" in export_modes:
            export_images["extensive_rescaled_mass"] = (
                fluidflower.geometry.make_extensive(products["rescaled_mass"])
            )
        for mode in export_modes:
            exporter.export(
                export_images[mode], output_folders[mode], path.stem
            )

        row = {
            "time": float(np.asarray(image_time)) if image_time is not None else None,
            "datetime": img.date,
            "image_stem": path.stem,
            "detected_mass_total": rescaled.detected_mass_total,
            "exact_mass_total": rescaled.exact_mass_total,
            "detected_mass_total_rescaled": float(
                fluidflower.geometry.integrate(products["rescaled_mass"])
            ),
            "mass_scaling_factor": rescaled.mass_scaling_factor,
        }
        for key, roi_config in config.analysis.mass.roi.items():
            name = roi_config.name or key
            roi = roi_config.roi
            row[f"{name}_exact_mass"] = float(
                experiment.injection_protocol.injected_mass(
                    date=img.date, roi=roi
                )
            )
            row[f"{name}_detected_mass"] = float(
                geometry[name].integrate(mass.subregion(roi))
            )
            row[f"{name}_detected_mass_g"] = float(
                geometry[name].integrate(mass_g.subregion(roi))
            )
            row[f"{name}_detected_mass_aq"] = float(
                geometry[name].integrate(mass_aq.subregion(roi))
            )

        mass_df = pd.concat([mass_df, pd.DataFrame([row])], ignore_index=True)
        mass_df.sort_values(by="time", inplace=True)
        mass_df.to_csv(csv_path, index=False)
        logger.info("Processed %s at time %s", path.stem, image_time)

        publish_stream_images(
            stream_callback=stream_callback,
            image_payload={
                "mass_source_image": img,
                "mass_total": mass,
                "rescaled_mass": products.get("rescaled_mass"),
            },
            logger=logger,
            error_message=f"Failed to stream mass previews for '{path}'.",
        )
        publish_image_progress(
            progress_callback,
            step="mass",
            image_path=str(path),
            image_index=image_index,
            image_total=len(image_paths),
            image_duration_s=time.monotonic() - image_started,
        )

    publish_step_complete(
        progress_callback,
        step="mass",
        step_elapsed_s=time.monotonic() - step_started,
    )
    return mass_df


def run_mass_analysis(path, cls=None, all: bool = False, **kwargs):
    """CLI entry: prepare context + run the mass loop."""
    from ..rig import Rig

    ctx = prepare_analysis_context(
        cls=cls or Rig, path=path, all=all, require_color_to_mass=True
    )
    return analysis_mass_from_context(ctx, **kwargs)


def analysis_mass(
    cls, path, show: bool = False, all: bool = False, stream_callback=None
):
    """Standalone mass-analysis entry point with the reference's argument
    order (reference analysis_mass.py:388-410)."""
    return run_mass_analysis(
        path, cls=cls, all=all, show=show, stream_callback=stream_callback
    )
