"""Characteristic-color extraction from image samples (k-means based).

Parity: reference ``src/darsia/utils/extractcharacteristicdata.py:15-189``.
Host-side setup utility using the deterministic k-means in
:mod:`darsia_tpu.utils.kmeans`.
"""

from __future__ import annotations

from typing import Literal, Optional
from warnings import warn

import numpy as np

from .kmeans import kmeans

__all__ = ["extract_characteristic_data"]


def extract_characteristic_data(
    signal,
    mask=None,
    samples: Optional[list[tuple]] = None,
    filter: callable = lambda x: x,
    num_clusters: int = 5,
    num_attempts: int = 100,
    num_iterations: int = 200,
    eps: float = 1e-1,
    mode: Literal["most_common", "least_common", "all"] = "most_common",
    show_plot: bool = False,
):
    """Extract representative colors from image patches via clustering.

    Args:
        signal: 2d (optionally multichannel) image or array.
        mask: boolean mask restricting eligible pixels.
        samples: list of 2d slice tuples; full image if None.
        filter: preprocessing callable (identity by default).
        num_clusters: clusters per sample.
        mode: return most-common / least-common cluster center, or all.

    Returns:
        (num_samples, data_dim) array of characteristic colors, or
        (labels, palettes) when mode == "all".

    """
    if samples is None:
        samples = [(slice(0, None), slice(0, None))]

    arr = np.atleast_3d(np.asarray(signal if isinstance(signal, np.ndarray) else signal.img))
    mask_arr = None
    if mask is not None:
        mask_arr = np.asarray(mask if isinstance(mask, np.ndarray) else mask.img).astype(bool)

    data_dim = arr.shape[-1]
    if data_dim not in (1, 3):
        data_dim = 1
        warn("Implicitly assume that the data is scalar.")

    clusters = []
    labels_collection = []
    palette_collection = []
    for sample in samples:
        patch = arr[sample]
        pixels = patch.reshape(-1, arr.shape[-1])[:, :data_dim]
        if mask_arr is not None:
            patch_mask = mask_arr[sample].reshape(-1)
            pixels = pixels[patch_mask]
        if pixels.shape[0] == 0:
            continue
        labels, palette = kmeans(
            pixels.astype(np.float64), num_clusters, num_iter=num_iterations
        )
        _, counts = np.unique(labels, return_counts=True)
        labels_collection.append(labels)
        palette_collection.append(palette)
        if mode == "most_common":
            clusters.append(palette[np.argmax(counts)])
        elif mode == "least_common":
            clusters.append(palette[np.argmin(counts)])

    if mode == "all":
        return labels_collection, palette_collection
    return np.array(clusters)
