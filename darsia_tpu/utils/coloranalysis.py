"""HSV spectrum analysis of image regions.

Parity: reference ``src/darsia/utils/coloranalysis.py:12``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.color import rgb_to_hsv

__all__ = ["hsv_spectrum"]


def hsv_spectrum(img, roi=None, bins: int = 100, show_plot: bool = False):
    """Histograms of hue/saturation/value over ROI(s).

    Args:
        img: RGB image (array or Image).
        roi: slice tuple or list of slice tuples.
        bins: histogram resolution.

    Returns:
        list of dicts with "hue", "saturation", "value" (histogram, edges)
        per ROI.

    """
    arr = np.asarray(img.img if hasattr(img, "img") else img, dtype=np.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    rois = roi if isinstance(roi, list) else [roi]
    results = []
    for r in rois:
        patch = arr if r is None else arr[r]
        hsv = np.asarray(rgb_to_hsv(jnp.asarray(patch)))
        spectrum = {}
        for i, key in enumerate(("hue", "saturation", "value")):
            values = hsv[..., i].ravel()
            rng = (0, 360.0) if key == "hue" else (0.0, 1.0)
            hist, edges = np.histogram(values, bins=bins, range=rng)
            spectrum[key] = (hist, edges)
        results.append(spectrum)
    if show_plot:  # pragma: no cover - visual
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(1, 3, figsize=(12, 3))
        for i, key in enumerate(("hue", "saturation", "value")):
            for spectrum in results:
                hist, edges = spectrum[key]
                axs[i].plot(edges[:-1], hist)
            axs[i].set_title(key)
        plt.show()
    return results
