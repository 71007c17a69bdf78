"""Watershed segmentation of layered media (skimage-free).

Parity: reference ``src/darsia/utils/segmentation.py:20-710``.

The workflow (denoise -> gradient edges -> markers -> watershed -> cleanup)
is preserved; compute mapping:

* denoising: our median filter / split-Bregman TVD (device);
* edges: Scharr/gradient stencils as JAX convolutions (device);
* watershed: ``scipy.ndimage.watershed_ift`` (host C; setup-time operation,
  consistent with SURVEY §2.11's "setup-time, not hot path" note).
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from ..ops.color import rgb_to_gray, rgb_to_hsv
from .morphology import disk

__all__ = [
    "segment",
    "label_image",
    "group_labels",
    "reassign_labels",
    "make_consecutive",
    "scharr_edges",
]


def _equalize(arr: np.ndarray) -> np.ndarray:
    """Log + adaptive-histogram-ish contrast normalization (host, setup)."""
    arr = arr.astype(np.float64)
    arr = arr - arr.min()
    arr = arr / max(arr.max(), 1e-12)
    arr = np.log1p(arr) / np.log(2.0)
    # Global histogram equalization as a light-weight CLAHE stand-in.
    flat = arr.ravel()
    sorted_idx = np.argsort(flat)
    cdf = np.empty_like(flat)
    cdf[sorted_idx] = np.linspace(0, 1, flat.size)
    return cdf.reshape(arr.shape)


def scharr_edges(gray: np.ndarray) -> np.ndarray:
    """Scharr gradient magnitude (JAX stencil)."""
    g = jnp.asarray(gray, dtype=jnp.float32)
    kx = jnp.array(
        [[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], dtype=jnp.float32
    ) / 16.0
    ky = kx.T
    from jax.scipy.signal import convolve2d

    gx = convolve2d(g, kx, mode="same")
    gy = convolve2d(g, ky, mode="same")
    return np.asarray(jnp.sqrt(gx**2 + gy**2))


def segment(
    img,
    markers_method: str = "gradient_based",
    edges_method: str = "gradient_based",
    mask: Optional[np.ndarray] = None,
    verbosity: bool = False,
    **kwargs,
):
    """Watershed segmentation workflow for layered media.

    Args:
        img: RGB or scalar image (array or Image).
        markers_method: "gradient_based" (auto markers from flat regions) or
            "supervised" (markers from user points in kwargs).
        edges_method: "gradient_based" or "scharr".
        mask: restrict segmentation to a region.
        kwargs: "median disk radius", "rescaling factor",
            "monochromatic_color", "markers disk radius", "threshold",
            "region_size", "marker_points", "gradient disk radius",
            "cleanup", "dilation size", "boundary size", "boundary".

    Returns:
        Labeled regions in the same container type as ``img``.

    """
    is_image = hasattr(img, "img")
    basis = np.asarray(img.img if is_image else img, dtype=np.float64)
    if basis.max() > 1.5:
        basis = basis / 255.0

    # Monochromatic representation.
    if basis.ndim == 2:
        mono = basis
    else:
        monochromatic = kwargs.get("monochromatic_color", "gray")
        if monochromatic == "gray":
            mono = np.asarray(rgb_to_gray(jnp.asarray(basis, dtype=jnp.float32)))
        elif monochromatic in ("red", "green", "blue"):
            mono = basis[..., ("red", "green", "blue").index(monochromatic)]
        elif monochromatic == "value":
            mono = np.asarray(
                rgb_to_hsv(jnp.asarray(basis, dtype=jnp.float32))[..., 2]
            )
        else:
            raise ValueError(f"Monochromatic color {monochromatic} unsupported.")
    mono = _equalize(mono)

    # Denoise.
    smoothing_method = kwargs.get("method", "median")
    if smoothing_method == "median":
        radius = kwargs.get("median disk radius", 20)
        denoised = ndimage.median_filter(mono, footprint=disk(min(radius, 15)))
    elif smoothing_method == "tvd":
        from ..restoration.split_bregman_tvd import split_bregman_tvd

        denoised = np.asarray(
            split_bregman_tvd(mono.astype(np.float32), mu=0.1, max_num_iter=100)
        )
    else:
        raise ValueError(f"Smoothing method {smoothing_method} unsupported.")

    # Optional rescaling for speed.
    factor = kwargs.get("rescaling factor", 1.0)
    work = denoised
    if factor != 1.0:
        import jax

        new_shape = (
            max(int(denoised.shape[0] * factor), 8),
            max(int(denoised.shape[1] * factor), 8),
        )
        work = np.asarray(
            jax.image.resize(jnp.asarray(denoised), new_shape, "linear")
        )

    # Edges.
    if edges_method == "scharr":
        edges = scharr_edges(work)
        scharr_mask = kwargs.get("scharr mask")
        if scharr_mask is not None and scharr_mask.shape == edges.shape:
            edges = np.where(scharr_mask, edges, 0.0)
    else:
        radius = kwargs.get("gradient disk radius", 2)
        edges = ndimage.maximum_filter(
            scharr_edges(work), footprint=disk(radius)
        )

    # Markers.
    if markers_method == "supervised":
        markers = np.zeros(work.shape, dtype=np.int32)
        patch = kwargs.get("region_size", 1)
        pts = kwargs.get("marker_points")
        assert pts is not None, "Provide marker_points for supervised markers."
        for i, pt in enumerate(np.asarray(pts, dtype=int)):
            r, c = pt
            markers[
                max(r - patch, 0) : r + patch + 1,
                max(c - patch, 0) : c + patch + 1,
            ] = i + 1
    else:
        threshold = kwargs.get("threshold")
        if threshold is None:
            threshold = np.quantile(edges, 0.3)
        flat = edges < threshold
        radius = kwargs.get("markers disk radius")
        if radius:
            flat = ndimage.binary_erosion(flat, structure=disk(radius))
        markers, _ = ndimage.label(flat)

    # Watershed on the edge landscape (host C implementation).
    landscape = (edges / max(edges.max(), 1e-12) * 65534).astype(np.uint16)
    labels = ndimage.watershed_ift(landscape, markers.astype(np.int32))
    labels = np.maximum(labels, 0)

    if factor != 1.0:
        import jax

        labels = np.asarray(
            jax.image.resize(
                jnp.asarray(labels.astype(np.float32)),
                denoised.shape,
                "nearest",
            )
        ).astype(np.int32)

    if mask is not None:
        labels = np.where(np.asarray(mask, dtype=bool), labels, 0)

    if kwargs.get("cleanup", True):
        labels = _cleanup(labels, **kwargs)

    labels = _reset_labels(labels)

    if is_image:
        meta = img.metadata()
        meta["scalar"] = True
        from ..image.image import Image

        return Image(labels, **meta)
    return labels


def _cleanup(labels: np.ndarray, **kwargs) -> np.ndarray:
    """Fill holes + dilate + deactivate boundary strips."""
    labels = _fill_holes(labels)
    dilation_size = kwargs.get("dilation size", 0)
    if dilation_size > 0:
        labels = ndimage.grey_dilation(labels, size=(dilation_size,) * 2)
    boundary_size = kwargs.get("boundary size", 0)
    if boundary_size > 0:
        for side in kwargs.get("boundary", ["top", "left", "bottom", "right"]):
            if side == "top":
                labels[:boundary_size] = labels[boundary_size : boundary_size + 1]
            elif side == "bottom":
                labels[-boundary_size:] = labels[
                    -boundary_size - 1 : -boundary_size
                ]
            elif side == "left":
                labels[:, :boundary_size] = labels[
                    :, boundary_size : boundary_size + 1
                ]
            elif side == "right":
                labels[:, -boundary_size:] = labels[
                    :, -boundary_size - 1 : -boundary_size
                ]
    return labels


def _fill_holes(labels: np.ndarray) -> np.ndarray:
    """Assign unlabeled pixels to their nearest labeled region."""
    unlabeled = labels == 0
    if not unlabeled.any():
        return labels
    _, (ir, ic) = ndimage.distance_transform_edt(
        unlabeled, return_indices=True
    )
    return labels[ir, ic]


def _reset_labels(labels: np.ndarray) -> np.ndarray:
    """Make labels consecutive starting at 0."""
    unique = np.unique(labels)
    mapping = np.zeros(unique.max() + 1, dtype=np.int32)
    mapping[unique] = np.arange(len(unique))
    return mapping[labels]


def label_image(img, map: Optional[dict] = None, significance: float = 0.0, **kwargs):
    """Label a colored sketch image: each distinct color becomes a label.

    Parity: reference ``utils/segmentation.py:516``.
    """
    is_image = hasattr(img, "img")
    data = np.asarray(img.img if is_image else img)
    if data.ndim == 2:
        labels = _reset_labels(data.astype(np.int32))
    else:
        flat = data.reshape(-1, data.shape[-1])
        quantized = np.round(flat.astype(np.float64) * 16) / 16
        colors, inverse = np.unique(quantized, axis=0, return_inverse=True)
        labels = inverse.reshape(data.shape[:2]).astype(np.int32)
        if significance > 0:
            counts = np.bincount(labels.ravel())
            small = counts < significance * labels.size
            labels = np.where(small[labels], 0, labels)
            labels = _fill_holes(labels + 1) - 1 if small.any() else labels
        labels = _reset_labels(labels)
    if is_image:
        from ..image.image import Image

        meta = img.metadata()
        meta["scalar"] = True
        return Image(labels, **meta)
    return labels


def group_labels(labels, groups: list):
    """Merge groups of labels: each listed group becomes one label."""
    arr = np.asarray(labels.img if hasattr(labels, "img") else labels)
    out = arr.copy()
    for group in groups:
        target = group[0]
        for label in group[1:]:
            out[arr == label] = target
    out = _reset_labels(out)
    if hasattr(labels, "img"):
        result = labels.copy()
        result.img = out
        return result
    return out


def reassign_labels(labels, mapping: dict):
    """Apply an explicit old-label -> new-label mapping."""
    arr = np.asarray(labels.img if hasattr(labels, "img") else labels)
    out = arr.copy()
    for old, new in mapping.items():
        out[arr == old] = new
    if hasattr(labels, "img"):
        result = labels.copy()
        result.img = out
        return result
    return out


def make_consecutive(labels):
    """Renumber labels consecutively from 0."""
    arr = np.asarray(labels.img if hasattr(labels, "img") else labels)
    out = _reset_labels(arr.astype(np.int32))
    if hasattr(labels, "img"):
        result = labels.copy()
        result.img = out
        return result
    return out
