"""FluidFlower rig manager with watershed geometry segmentation.

Parity: reference ``presets/fluidflower/fluidflowerrig.py:15-85``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np

from ...manager.analysisbase import AnalysisBase
from ...utils.segmentation import segment

__all__ = ["FluidFlowerRig"]


class FluidFlowerRig(AnalysisBase):
    """AnalysisBase + watershed segmentation of the rig geometry."""

    def __init__(
        self,
        baseline,
        config: Union[str, Path],
        update_setup: bool = False,
    ) -> None:
        super().__init__(baseline, config, update_setup)
        self._segment_geometry(update_setup=update_setup)

    def _segment_geometry(self, update_setup: bool = False) -> None:
        """Segment the baseline geometry, cached to labels_path."""
        labels_path = Path(self.config["segmentation"]["labels_path"])
        if labels_path.exists() and not update_setup:
            labels = np.load(labels_path)
        else:
            labels = segment(
                np.asarray(self.base.img),
                markers_method="supervised",
                edges_method="scharr",
                **self.config["segmentation"],
            )
            labels = np.asarray(labels.img if hasattr(labels, "img") else labels)
            labels_path.parent.mkdir(parents=True, exist_ok=True)
            np.save(labels_path, labels)
        self.labels = labels

    def _labels_to_mask(self, ids) -> np.ndarray:
        ids = ids if isinstance(ids, list) else [ids]
        mask = np.zeros(np.asarray(self.labels).shape[:2], dtype=bool)
        for i in ids:
            mask[self.labels == i] = True
        return mask
