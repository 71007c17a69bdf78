"""JSON-config-driven analysis managers.

Parity: reference ``src/darsia/manager/analysisbase.py:20-230``.
"""

from __future__ import annotations

import json
import logging
import time
from datetime import datetime
from pathlib import Path
from typing import Optional, Union

from ..corrections.color.colorcorrection import ColorCorrection
from ..corrections.shape.curvature import CurvatureCorrection
from ..corrections.shape.deformation import DeformationCorrection
from ..corrections.shape.drift import DriftCorrection
from ..corrections.shape.translation import TranslationCorrection
from ..image.imread import imread

logger = logging.getLogger(__name__)

__all__ = ["AnalysisBase"]

#: Correction pipeline in application order.  Each entry: (attribute,
#: config section, factory).  Baseline-anchored corrections (drift,
#: deformation) receive the baseline read with all corrections built SO
#: FAR — hence assembly happens stage by stage below.
_PIPELINE = (
    ("drift_correction", "drift", "baseline"),
    ("deformation_correction", "deformation", "baseline"),
    ("color_correction", "color", "plain"),
    ("translation_correction", "translation", "translation"),
    ("curvature_correction", "curvature", "plain"),
)


class AnalysisBase:
    """Standard time-series analysis setup from a JSON config.

    The correction chain (drift -> deformation -> color -> translation ->
    curvature, matching the reference pipeline order) is assembled from the
    config's sections and applied on every read; runs of geometric
    corrections fuse into one warp inside :func:`imread`.
    """

    def __init__(
        self,
        baseline,
        config: Union[str, Path],
        update_setup: bool = False,
    ) -> None:
        self.config = json.loads(Path(config).read_text())

        dims = self.config.get("physical_asset", {}).get("dimensions")
        if dims is None:
            raise ValueError(
                "Config lacks physical_asset.dimensions (width/height)."
            )
        self.width = dims["width"]
        self.height = dims["height"]
        self.origin = [0.0, self.height]

        stamp = self.config.get("reference_date")
        self.reference_date: Optional[datetime] = (
            datetime.strptime(stamp, "%Y-%m-%d %H:%M:%S") if stamp else None
        )

        anchor = baseline[0] if isinstance(baseline, list) else baseline
        self.processed_baseline_images = None
        self.verbosity = self.config.get("verbosity", False)

        for attribute, _section, _kind in _PIPELINE:
            setattr(self, attribute, None)

        # Stage-wise assembly: each baseline-anchored correction is built
        # against the baseline as corrected by the stages before it.
        self.uncorrected_base = self._read(anchor)
        for attribute, section, kind in _PIPELINE:
            if section not in self.config:
                continue
            section_config = self.config[section]
            if kind == "baseline":
                correction = {
                    "drift": DriftCorrection,
                    "deformation": DeformationCorrection,
                }[section](base=self._read(anchor), config=section_config)
            elif kind == "translation":
                correction = TranslationCorrection(translation=section_config)
            else:
                factory = {
                    "color": ColorCorrection,
                    "curvature": CurvatureCorrection,
                }[section]
                correction = factory(config=section_config)
            setattr(self, attribute, correction)
            if section == "drift":
                # Kept for subclasses that re-anchor on the drift-aligned
                # baseline (reference attribute).
                self.drift_corrected_base = self._read(anchor)
        if not hasattr(self, "drift_corrected_base"):
            self.drift_corrected_base = self.uncorrected_base

        self.base = self._read(anchor)

    def _read(self, path):
        """Read one image through the currently assembled chain."""
        chain = [getattr(self, attribute) for attribute, _s, _k in _PIPELINE]
        return imread(
            path,
            transformations=chain,
            width=self.width,
            height=self.height,
            origin=self.origin,
            reference_date=self.reference_date,
        )

    def load_and_process_image(self, path):
        self.img = self._read(path)
        return self.img

    def single_image_analysis(self, img, **kwargs):
        raise NotImplementedError(
            "Subclasses define the per-image analysis."
        )

    def batch_analysis(self, images, **kwargs) -> None:
        """Best-effort single_image_analysis over a batch of paths."""
        batch = images if isinstance(images, list) else [images]
        for item in batch:
            tic = time.time()
            try:
                self.single_image_analysis(item, **kwargs)
            except Exception as exc:  # keep going; report per item
                logger.error("Analysis of %s failed: %s", item, exc)
                continue
            if self.verbosity:
                logger.info(
                    "Analyzed %s in %.2f s", Path(item).name, time.time() - tic
                )
