"""Expert-knowledge ROI constraints on analysis fields.

Physical prior knowledge enters the workflow as named regions of interest
per output field: gas saturation can only appear in sealed regions, aqueous
concentration only below the water table, etc.  The adapter rasterizes the
configured ROIs once per (field, geometry) pair and zeroes each produced
field outside its allowed support.

Parity: reference ``presets/workflows/analysis/expert_knowledge.py:20-110``
(TPU-side note: masking happens host-side at workflow granularity — it is a
setup-scale operation, not part of the per-image jitted pipeline).
"""

from __future__ import annotations

import numpy as np

from ....utils.standard_images import roi_to_mask

__all__ = ["ExpertKnowledgeAdapter"]

#: Output fields that accept expert ROI constraints, mapped to the
#: constructor keyword holding their ROI table.
_CONSTRAINED_FIELDS = ("saturation_g", "concentration_aq")


def _geometry_key(image) -> tuple:
    """Hashable fingerprint of an image's raster geometry.

    Masks depend only on voxel count + physical extent + origin, so two
    images sharing a geometry share one rasterized mask.
    """
    meta = image.metadata()
    dims = np.asarray(meta.get("dimensions", []), dtype=float)
    origin = np.asarray(meta.get("origin", []), dtype=float)
    return (
        tuple(map(int, image.num_voxels)),
        tuple(dims.tolist()),
        tuple(origin.tolist()),
    )


def _rasterize(rois: dict, image) -> np.ndarray:
    """Union of the named ROIs as a boolean voxel mask on ``image``."""
    boxes = [r.roi if hasattr(r, "roi") else r for r in rois.values()]
    return np.asarray(roi_to_mask(boxes, image).img, dtype=bool)


class ExpertKnowledgeAdapter:
    """Zero out scalar fields outside the allowed expert ROIs."""

    def __init__(self, saturation_g_rois=None, concentration_aq_rois=None):
        self._rois = {
            "saturation_g": dict(saturation_g_rois or {}),
            "concentration_aq": dict(concentration_aq_rois or {}),
        }
        self._masks: dict = {}

    @classmethod
    def from_config(cls, config, roi_registry) -> "ExpertKnowledgeAdapter":
        """Resolve the config's ROI name lists against the loaded registry."""
        tables = dict.fromkeys(_CONSTRAINED_FIELDS, None)
        if config is not None and roi_registry is not None:
            for mode in _CONSTRAINED_FIELDS:
                names = getattr(config, mode, None)
                if names:
                    tables[mode] = roi_registry.resolve_rois(names)
        return cls(
            saturation_g_rois=tables["saturation_g"],
            concentration_aq_rois=tables["concentration_aq"],
        )

    def mask_for(self, image, mode: str):
        """Boolean support mask for ``mode`` on ``image`` (None = no limit)."""
        rois = self._rois.get(mode) or {}
        if not rois:
            return None
        key = (mode, _geometry_key(image))
        mask = self._masks.get(key)
        if mask is None:
            mask = self._masks[key] = _rasterize(rois, image)
        return mask

    def apply(self, image, mode: str):
        """Return ``image`` with values outside the ``mode`` support zeroed."""
        if image is None:
            return None
        mask = self.mask_for(image, mode)
        if mask is None:
            return image
        out = image.copy()
        out.img = np.where(mask, np.asarray(out.img), 0.0)
        return out
