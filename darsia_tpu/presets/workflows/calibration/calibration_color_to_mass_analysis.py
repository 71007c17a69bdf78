"""Color-to-mass calibration workflow step.

Parity: reference
``presets/workflows/calibration/calibration_color_to_mass_analysis.py``:
build the chain from calibrated color paths + default signal functions,
run automatic calibration against the injection protocol, persist.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from ....multiphase.flash import SimpleFlash
from ....multiphase.mass_analysis import CO2MassAnalysis
from ....signals.color import ColorPathEmbedding, LabelColorPathMap
from ....signals.models.color_path_interpolation import ColorPathInterpolation
from ....signals.models.pwtransformation import PWTransformation
from ..analysis.analysis_context import AnalysisContext, prepare_analysis_context
from ..heterogeneous_color_to_mass_analysis import HeterogeneousColorToMassAnalysis
from .metadata import validate_basis_metadata, write_calibration_metadata

logger = logging.getLogger(__name__)

__all__ = [
    "calibration_color_to_mass_analysis_from_context",
    "calibration_color_to_mass_analysis",
]


def calibration_color_to_mass_analysis_from_context(
    ctx: AnalysisContext,
    show: bool = False,
    mode: str = "auto",
    maxiter: int = 20,
) -> HeterogeneousColorToMassAnalysis:
    config = ctx.config
    fluidflower = ctx.fluidflower
    experiment = ctx.experiment
    config.check("rig", "data", "protocol", "color", "calibration")
    assert config.calibration is not None and config.calibration.mass is not None
    embedding = config.calibration.mass.color
    if not isinstance(embedding, ColorPathEmbedding):
        raise NotImplementedError(
            "calibration.mass currently supports only color path embeddings."
        )
    validate_basis_metadata(embedding.color_paths_folder, embedding.basis)

    labels = embedding.get_labels(fluidflower)
    color_paths = LabelColorPathMap.load(embedding.color_paths_folder)
    if not color_paths:
        raise FileNotFoundError(
            f"No calibrated color paths under {embedding.color_paths_folder}; "
            "run the color-path calibration first."
        )
    interpretations = {
        label: ColorPathInterpolation(path, embedding.mode)
        for label, path in color_paths.items()
    }
    # Default monotone signal functions (identity on [0, 1]).
    signal_functions = {
        label: PWTransformation(
            supports=np.linspace(0, 1, 3), values=np.linspace(0, 1, 3)
        )
        for label in color_paths
    }
    threshold = config.calibration.mass.threshold
    flash = SimpleFlash(
        min_value_aq=0.0,
        max_value_aq=threshold,
        min_value_g=threshold,
        max_value_g=1.0,
    )
    start = experiment.experiment_start
    if experiment.pressure_temperature_protocol is not None:
        state = experiment.pressure_temperature_protocol.get_state(start)
        pressure, temperature = state.pressure, state.temperature
    else:
        pressure, temperature = 1.01, 23.0
    co2_mass_analysis = CO2MassAnalysis(
        baseline=fluidflower.baseline,
        atmospheric_pressure=pressure,
        atmospheric_temperature=temperature,
    )
    chain = HeterogeneousColorToMassAnalysis(
        baseline=fluidflower.baseline,
        labels=labels,
        color_mode=embedding.mode,
        color_path_interpretation=interpretations,
        signal_functions=signal_functions,
        flash=flash,
        co2_mass_analysis=co2_mass_analysis,
        geometry=fluidflower.geometry,
        restoration=ctx.restoration,
        basis=embedding.basis,
        ignore_labels=embedding.ignore_labels,
    )

    if (config.calibration.mass.mode or mode) == "auto":
        images = [fluidflower.read_image(p) for p in ctx.image_paths]
        chain.automatic_calibration(
            images,
            experiment,
            maxiter=getattr(config.calibration.mass, "maxiter", maxiter),
        )

    chain.save(embedding.color_to_mass_folder)
    write_calibration_metadata(
        embedding.color_to_mass_folder,
        embedding.basis,
        extra={"embedding_id": embedding.embedding_id},
    )
    logger.info(
        "Color-to-mass calibration saved to %s.", embedding.color_to_mass_folder
    )
    return chain


def calibration_color_to_mass_analysis(path, cls=None, **kwargs):
    from ..rig import Rig

    ctx = prepare_analysis_context(
        cls=cls or Rig,
        path=path,
        section="calibration",
        sub_config=None,
    )
    # Calibration image selection: [calibration.mass].data if present.
    if (
        ctx.config.calibration is not None
        and ctx.config.calibration.mass is not None
        and ctx.config.calibration.mass.data is not None
    ):
        from types import SimpleNamespace

        from ..analysis.analysis_context import select_image_paths

        ctx.image_paths = select_image_paths(
            ctx.config,
            ctx.experiment,
            sub_config=SimpleNamespace(data=ctx.config.calibration.mass.data),
        )
    return calibration_color_to_mass_analysis_from_context(ctx, **kwargs)
