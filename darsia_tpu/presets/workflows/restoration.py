"""Restoration construction with rig-derived ignore masks.

Parity: reference ``presets/workflows/restoration.py:19-120``.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from ...restoration.averaging import REV, VolumeAveraging
from ...restoration.tvd import TVD

logger = logging.getLogger(__name__)

__all__ = ["RestorationMaskFactory", "build_restoration"]


class RestorationMaskFactory:
    """Build boolean ignore masks from rig fields by name."""

    def __init__(self, fluidflower) -> None:
        self.fluidflower = fluidflower
        self._builders = {
            "image_porosity": self._image_porosity_ignore_mask,
            "boolean_porosity": self._boolean_porosity_ignore_mask,
            "inner_labels": self._inner_labels_ignore_mask,
        }

    def _image_porosity_ignore_mask(self) -> np.ndarray:
        return np.asarray(self.fluidflower.image_porosity.img) <= 0

    def _boolean_porosity_ignore_mask(self) -> np.ndarray:
        return ~np.asarray(self.fluidflower.boolean_porosity.img, dtype=bool)

    def _inner_labels_ignore_mask(self) -> np.ndarray:
        return ~np.asarray(self.fluidflower.inner_labels.img, dtype=bool)

    def build_ignore_mask(self, mask_names: list) -> Optional[np.ndarray]:
        if not mask_names:
            return None
        ignore = None
        for name in mask_names:
            if name not in self._builders:
                raise ValueError(
                    f"Unknown restoration ignore mask {name!r}. Valid: "
                    f"{list(self._builders)}."
                )
            current = self._builders[name]()
            ignore = current if ignore is None else np.logical_or(ignore, current)
        return ignore


def build_restoration(restoration_config, fluidflower):
    """Instantiate the configured restoration with rig-derived masks."""
    if restoration_config is None or restoration_config.method is None:
        logger.info("No restoration configured; proceeding without.")
        return None
    ignore = RestorationMaskFactory(fluidflower).build_ignore_mask(
        list(getattr(restoration_config, "ignore", []) or [])
    )
    method = restoration_config.method
    if method in ("volume_average", "volume_averaging"):
        shape = np.asarray(fluidflower.baseline.img).shape[:2]
        mask = np.ones(shape, dtype=bool) if ignore is None else ~ignore
        rev = REV(float(restoration_config.options.rev_size), fluidflower.baseline)
        return VolumeAveraging(rev, mask=mask)
    if method == "tvd":
        options = restoration_config.options
        weight = options.weight
        if isinstance(weight, str):
            # "image_porosity" / "boolean_porosity" weight fields.
            weight_field = getattr(fluidflower, weight).img
            weight = np.asarray(weight_field, dtype=float)
        return TVD(
            weight=weight,
            method=options.method,
            max_num_iter=options.max_num_iter,
            eps=options.eps,
            omega=options.omega,
            regularization=options.regularization,
            **options.kwargs,
        )
    raise ValueError(f"Unknown restoration method {method!r}.")
