"""Drift correction: align images to a baseline via ROI translation.

Parity: reference ``src/darsia/corrections/shape/drift.py:15-135``.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from ...utils.box import bounding_box
from ..base import BaseCorrection
from .translation import TranslationEstimator

__all__ = ["DriftCorrection"]


class DriftCorrection(BaseCorrection):
    """Correct camera drift by translating images onto a baseline."""

    def __init__(self, base=None, config: Optional[dict] = None) -> None:
        """
        Args:
            base: baseline image (Image or array).
            config: dict with keys ``roi`` (slices tuple or corner points),
                ``padding`` (relative), ``active`` (bool).

        """
        if base is not None and hasattr(base, "img"):
            if base.space_dim != 2:
                raise NotImplementedError
            self.base = np.asarray(base.img)
        elif base is not None:
            self.base = np.asarray(base)
        else:
            self.base = None

        self._init_from_config(config or {})
        self.translation_estimator = TranslationEstimator()

    def _init_from_config(self, config: dict) -> None:
        self.active = config.get("active", True)
        self.relative_padding: float = config.get("padding", 0.0)
        # Static bound on the estimated drift (voxels) — keeps the fused
        # Pallas warp's displacement window sound and rejects wild estimates.
        self.max_displacement: float = float(
            config.get("max_displacement", 64.0)
        )
        roi = config.get("roi")
        if roi is None:
            self.roi = None
        elif isinstance(roi, tuple):
            self.roi = roi
        else:
            self.roi = bounding_box(
                np.asarray(roi),
                padding=round(
                    self.relative_padding * np.min(self.base.shape[:2])
                ),
                max_size=list(self.base.shape[:2]),
            )

    def return_config(self) -> dict:
        return {
            "active": self.active,
            "padding": self.relative_padding,
            "roi": self.roi,
        }

    def correct_array(
        self, img: jnp.ndarray, roi: Optional[tuple] = None
    ) -> jnp.ndarray:
        if not self.active or self.base is None:
            return img
        roi_src = self.roi if roi is None else roi
        return self.translation_estimator.match_roi(
            img_src=img, img_dst=self.base, roi_src=roi_src, roi_dst=self.roi
        )

    def pullback_translation(self, img: jnp.ndarray) -> jnp.ndarray:
        """Traced per-image pull-back translation (fusion protocol).

        Same estimate as :meth:`correct_array` (FFT phase correlation on the
        ROI vs the baseline) but returned as a traced ``(drow, dcol)``
        displacement to add to a downstream composed coordinate field,
        instead of spending a resampling pass here.
        """
        from ...corrections.shape.translation import _to_gray
        from ...ops.fft import phase_correlation

        if not self.active or self.base is None:
            return jnp.zeros(2, dtype=jnp.float32)
        a = _to_gray(jnp.asarray(img))
        b = _to_gray(jnp.asarray(self.base))
        if self.roi is not None:
            a = a[self.roi[0], self.roi[1]]
            b = b[self.roi[0], self.roi[1]]
        h = min(a.shape[0], b.shape[0])
        w = min(a.shape[1], b.shape[1])
        if h < 2 or w < 2:
            return jnp.zeros(2, dtype=jnp.float32)
        shift, _ = phase_correlation(a[:h, :w], b[:h, :w])
        # translate_array's pull-back field is identity - shift.
        t = -shift.astype(jnp.float32)
        return jnp.where(jnp.isfinite(t), t, 0.0)

    def save(self, path) -> None:
        from pathlib import Path

        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        roi_serial = (
            None
            if self.roi is None
            else [[sl.start, sl.stop] for sl in self.roi]
        )
        np.savez(
            path,
            class_name=type(self).__name__,
            base=np.asarray(self.base),
            config=np.array(
                [{"active": self.active, "padding": self.relative_padding,
                  "roi_bounds": roi_serial}],
                dtype=object,
            ),
        )

    def load(self, path) -> None:
        data = np.load(path, allow_pickle=True)
        self.base = data["base"]
        config = data["config"][0]
        roi_bounds = config.pop("roi_bounds", None)
        if roi_bounds is not None:
            config["roi"] = tuple(slice(b[0], b[1]) for b in roi_bounds)
        self._init_from_config(config)
