"""Expert-knowledge ROI constraints on analysis fields.

Parity: reference ``presets/workflows/analysis/expert_knowledge.py:20-110``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ....utils.standard_images import roi_to_mask

__all__ = ["ExpertKnowledgeAdapter"]


@dataclass
class ExpertKnowledgeAdapter:
    """Zero out scalar fields outside the allowed expert ROIs."""

    saturation_g_rois: dict = field(default_factory=dict)
    concentration_aq_rois: dict = field(default_factory=dict)
    _mask_cache: dict = field(default_factory=dict, init=False)

    @classmethod
    def from_config(cls, config, roi_registry) -> "ExpertKnowledgeAdapter":
        if config is None:
            return cls()
        saturation, concentration = {}, {}
        if roi_registry is not None:
            if config.saturation_g:
                saturation = roi_registry.resolve_rois(config.saturation_g)
            if config.concentration_aq:
                concentration = roi_registry.resolve_rois(
                    config.concentration_aq
                )
        return cls(
            saturation_g_rois=saturation, concentration_aq_rois=concentration
        )

    def _signature(self, image) -> tuple:
        metadata = image.metadata()
        return (
            tuple(int(v) for v in image.num_voxels),
            tuple(np.asarray(metadata.get("dimensions", []), float)),
            tuple(np.asarray(metadata.get("origin", []), float)),
        )

    def _rois_for_mode(self, mode: str) -> dict:
        if mode == "saturation_g":
            return self.saturation_g_rois
        if mode == "concentration_aq":
            return self.concentration_aq_rois
        return {}

    def mask_for(self, image, mode: str):
        rois = self._rois_for_mode(mode)
        if not rois:
            return None
        key = (mode, self._signature(image))
        if key not in self._mask_cache:
            mask_image = roi_to_mask(
                [roi.roi if hasattr(roi, "roi") else roi for roi in rois.values()],
                image,
            )
            self._mask_cache[key] = np.asarray(mask_image.img, dtype=bool)
        return self._mask_cache[key]

    def apply(self, image, mode: str):
        if image is None:
            return None
        mask = self.mask_for(image, mode)
        if mask is None:
            return image
        constrained = image.copy()
        arr = np.asarray(constrained.img).copy()
        arr[~mask] = 0.0
        constrained.img = arr
        return constrained
