"""Simple image analysis: CO2 and tracer concentrations from photographs.

Mirrors reference examples/co2_and_tracer_analysis.py: curvature + color
corrected images feed two ConcentrationAnalysis pipelines (red-channel CO2
detection and grayscale tracer detection).
"""

import json

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as darsia
from _data import images_folder, load_baseline, load_co2_series

folder = images_folder()

if folder is not None and (folder / "config.json").exists():
    with open(folder / "config.json") as openfile:
        config = json.load(openfile)
    curvature_correction = darsia.CurvatureCorrection(config=config["curvature"])
    color_correction = darsia.ColorCorrection(
        config={
            "roi": darsia.make_voxel(
                [[152, 202], [225, 206], [226, 101], [153, 98]]
            )
        }
    )
    transformations = [color_correction, curvature_correction]
    baseline_co2 = darsia.imread(
        folder / "co2_0.jpg", transformations=transformations,
        width=2.8, height=1.5,
    )
    co2_image = darsia.imread(
        folder / "co2_2.jpg", transformations=transformations,
        width=2.8, height=1.5,
    )
    baseline_tracer = darsia.imread(
        folder / "tracer_0.jpg", transformations=transformations,
        width=2.8, height=1.5,
    )
    tracer_image = darsia.imread(
        folder / "tracer_3.jpg", transformations=transformations,
        width=2.8, height=1.5,
    )
else:  # Synthetic fallback.
    baseline_co2 = baseline_tracer = load_baseline(shape=(180, 340))
    series = load_co2_series(shape=(180, 340))
    co2_image, tracer_image = series[2], series[1]

if _data.fast_mode():
    shrink = darsia.Resize(shape=(426, 795))
    baseline_co2 = shrink(baseline_co2)
    baseline_tracer = shrink(baseline_tracer)
    co2_image = shrink(co2_image)
    tracer_image = shrink(tracer_image)

_tvd_opts = {"max_num_iter": 30} if _data.fast_mode() else {}

# CO2: red-channel reduction -> TVD -> linear+clip model.
co2_analysis = darsia.ConcentrationAnalysis(
    base=baseline_co2,
    signal_reduction=darsia.MonochromaticReduction(color="red"),
    restoration=darsia.TVD(**_tvd_opts),
    model=darsia.CombinedModel(
        [
            darsia.LinearModel(scaling=4.0),
            darsia.ClipModel(**{"min_value": 0.0, "max_value": 1.0}),
        ]
    ),
)
co2 = co2_analysis(co2_image)
print("co2 concentration range:", float(np.min(co2.img)), float(np.max(co2.img)))

# Tracer: grayscale reduction -> TVD -> linear+clip model.
tracer_analysis = darsia.ConcentrationAnalysis(
    base=baseline_tracer,
    signal_reduction=darsia.MonochromaticReduction(color="gray"),
    restoration=darsia.TVD(**_tvd_opts),
    model=darsia.CombinedModel(
        [
            darsia.LinearModel(scaling=4.0),
            darsia.ClipModel(**{"min_value": 0.0, "max_value": 1.0}),
        ]
    ),
)
tracer = tracer_analysis(tracer_image)
print(
    "tracer concentration range:",
    float(np.min(tracer.img)),
    float(np.max(tracer.img)),
)
assert np.isfinite(np.asarray(co2.img)).all()
assert np.isfinite(np.asarray(tracer.img)).all()
