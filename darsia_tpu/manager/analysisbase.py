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


class AnalysisBase:
    """Standard time-series analysis setup from a JSON config.

    Builds drift/deformation/color/translation/curvature corrections in the
    fixed reference order and applies them on every read.
    """

    def __init__(
        self,
        baseline,
        config: Union[str, Path],
        update_setup: bool = False,
    ) -> None:
        with open(config, "r") as f:
            self.config = json.load(f)

        if (
            "physical_asset" in self.config
            and "dimensions" in self.config["physical_asset"]
        ):
            self.width = self.config["physical_asset"]["dimensions"]["width"]
            self.height = self.config["physical_asset"]["dimensions"]["height"]
            self.origin = [0.0, self.height]
        else:
            raise ValueError("Dimensions and origin not specified.")

        reference_date_str = self.config.get("reference_date", None)
        self.reference_date: Optional[datetime] = (
            None
            if reference_date_str is None
            else datetime.strptime(reference_date_str, "%Y-%m-%d %H:%M:%S")
        )

        reference_base = baseline[0] if isinstance(baseline, list) else baseline
        self.processed_baseline_images = None
        self.verbosity = self.config.get("verbosity", False)

        self.drift_correction = None
        self.deformation_correction = None
        self.color_correction = None
        self.translation_correction = None
        self.curvature_correction = None

        # The corrections reference the *uncorrected* baseline since they
        # are applied before curvature correction (reference order).
        self.uncorrected_base = self._read(reference_base)

        if "drift" in self.config:
            self.drift_correction = DriftCorrection(
                base=self.uncorrected_base, config=self.config["drift"]
            )
        self.drift_corrected_base = self._read(reference_base)
        if "deformation" in self.config:
            self.deformation_correction = DeformationCorrection(
                base=self.drift_corrected_base, config=self.config["deformation"]
            )
        if "color" in self.config:
            self.color_correction = ColorCorrection(config=self.config["color"])
        if "translation" in self.config:
            self.translation_correction = TranslationCorrection(
                translation=self.config["translation"]
            )
        if "curvature" in self.config:
            self.curvature_correction = CurvatureCorrection(
                config=self.config["curvature"]
            )

        self.base = self._read(reference_base)

    def _read(self, path):
        """Read an image applying the full correction chain."""
        return imread(
            path,
            transformations=[
                self.drift_correction,
                self.deformation_correction,
                self.color_correction,
                self.translation_correction,
                self.curvature_correction,
            ],
            width=self.width,
            height=self.height,
            origin=self.origin,
            reference_date=self.reference_date,
        )

    def load_and_process_image(self, path):
        self.img = self._read(path)
        return self.img

    def single_image_analysis(self, img, **kwargs):
        raise NotImplementedError("Has to be implemented for each special case.")

    def batch_analysis(self, images, **kwargs) -> None:
        """Run single_image_analysis over a batch of paths."""
        if not isinstance(images, list):
            images = [images]
        for img in images:
            tic = time.time()
            try:
                self.single_image_analysis(img, **kwargs)
            except Exception as exc:  # best-effort batch semantics
                logger.error("Analysis of %s failed: %s", img, exc)
                continue
            if self.verbosity:
                logger.info(
                    "Elapsed time for %s: %.2f s", Path(img).name, time.time() - tic
                )
