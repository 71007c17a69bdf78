"""Watershed segmentation of a layered medium.

Mirrors reference examples/segmentation.py.
"""

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as da
from _data import load_baseline

image = load_baseline(shape=(135, 256))

labels = da.segment(
    image,
    markers_method="supervised",
    edges_method="scharr",
    marker_points=[[30, 128], [100, 128]],
)
print("labels:", np.unique(np.asarray(labels.img)).tolist())

# Label utilities.
merged = da.group_labels(labels, [tuple(np.unique(np.asarray(labels.img))[:2])])
print("after merge:", np.unique(np.asarray(merged.img)).tolist())
