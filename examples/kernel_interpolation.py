"""Concentration analysis via kernel interpolation of calibration colors.

Mirrors reference examples/kernel_interpolation.py.
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da
from _data import load_baseline

baseline = load_baseline(shape=(135, 256))

# Tracer image: reddened band.
arr = np.asarray(baseline.img).copy()
arr[50:90, 60:200] = np.clip(arr[50:90, 60:200] + [0.25, -0.05, -0.05], 0, 1)
tracer = da.Image(arr, **baseline.metadata())

analysis = da.MultichromaticTracerAnalysis(
    baseline, relative=True, kernel=da.GaussianKernel(gamma=9.73)
)
analysis.calibrate_from_samples(
    tracer,
    samples_per_label=[[(slice(55, 85), slice(80, 120))]],
    concentrations_per_label=[[1.0]],
    num_clusters=3,
)
concentration = analysis(tracer)
data = np.asarray(concentration.img)
print("concentration in plume:", float(data[70, 100]))
print("concentration outside:", float(data[20, 20]))
