"""FluidFlower benchmark CO2 analysis preset.

Parity: reference ``presets/fluidflower/fluidflowerco2analysis.py:25-335``.
Contour plotting uses matplotlib (Agg) instead of cv2 drawContours.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np

from ...manager.co2analysis import CO2Analysis
from .benchmarkco2model import (
    benchmark_binary_cleaning_preset,
    benchmark_concentration_analysis_preset,
)

__all__ = ["FluidFlowerCO2Analysis"]


class FluidFlowerCO2Analysis(CO2Analysis):
    """Manage FluidFlower benchmark CO2 segmentation over a run."""

    def __init__(
        self,
        baseline,
        config: Union[str, Path],
        results: Union[str, Path],
        update_setup: bool = False,
        verbosity: int = 0,
    ) -> None:
        super().__init__(baseline, config, update_setup)
        if not hasattr(self, "labels"):
            self.labels = np.ones(np.asarray(self.base.img).shape[:2], dtype=int)
        self.path_to_results = Path(results)
        self.path_to_results.parent.mkdir(parents=True, exist_ok=True)
        self.verbosity = verbosity

    # ------------------------------------------------------------ detectors

    def define_co2_analysis(self):
        if not hasattr(self, "labels"):
            self.labels = np.ones(np.asarray(self.base.img).shape[:2], dtype=int)
        self.co2_binary_cleaning = benchmark_binary_cleaning_preset(
            self.base, self.config["co2"]
        )
        return benchmark_concentration_analysis_preset(
            self.base, self.labels, self.config["co2"]
        )

    def define_co2_gas_analysis(self):
        self.co2_gas_binary_cleaning = benchmark_binary_cleaning_preset(
            self.base, self.config["co2(g)"]
        )
        return benchmark_concentration_analysis_preset(
            self.base, self.labels, self.config["co2(g)"]
        )

    # ---------------------------------------------------- expert knowledge

    def _expert_knowledge_co2(self) -> np.ndarray:
        return np.ones(np.asarray(self.base.img).shape[:2], dtype=bool)

    def _expert_knowledge_co2_gas(self, co2) -> np.ndarray:
        return np.asarray(co2.img, dtype=bool)

    # ------------------------------------------------------------- masking

    def determine_co2_mask(self):
        expert_knowledge = self._expert_knowledge_co2()
        self.co2_analysis.update(mask=expert_knowledge)
        co2 = self.determine_co2()
        arr = np.asarray(co2.img).copy()
        arr[~expert_knowledge] = 0
        if np.any(~expert_knowledge):
            arr = np.asarray(self.co2_binary_cleaning(arr))
        co2.img = arr
        return co2

    def determine_co2_gas_mask(self, co2):
        expert_knowledge = self._expert_knowledge_co2_gas(co2)
        self.co2_gas_analysis.update(mask=expert_knowledge)
        co2_gas = self.determine_co2_gas()
        arr = np.asarray(co2_gas.img).copy()
        arr[~expert_knowledge] = 0
        if np.any(~expert_knowledge):
            arr = np.asarray(self.co2_gas_binary_cleaning(arr))
        co2_gas.img = arr
        return co2_gas

    # ------------------------------------------------------------ workflow

    def single_image_analysis(self, img, **kwargs):
        """Detect CO2 phases in a single image; optionally export
        segmentation (water=0, dissolved=1, gas=2) and contour plots."""
        if hasattr(img, "img"):
            self.img = img.copy()
            img_id = Path(getattr(img, "name", "image") or "image").stem
        else:
            self.load_and_process_image(img)
            img_id = Path(img).stem
        co2 = self.determine_co2_mask()
        co2_gas = self.determine_co2_gas_mask(co2)

        if kwargs.pop("write_contours_to_file", False):
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            out = self.path_to_results / "contour_plots"
            out.mkdir(parents=True, exist_ok=True)
            fig, ax = plt.subplots()
            ax.imshow(np.clip(np.asarray(self.img.img), 0, 1))
            ax.contour(np.asarray(co2.img), levels=[0.5], colors="g")
            ax.contour(np.asarray(co2_gas.img), levels=[0.5], colors="y")
            fig.savefig(out / f"{img_id}_with_contours.jpg", dpi=200)
            plt.close(fig)

        if kwargs.pop("write_segmentation_to_file", False) or kwargs.pop(
            "write_coarse_segmentation_to_file", False
        ):
            segmentation = np.zeros(
                np.asarray(self.img.img).shape[:2], dtype=int
            )
            segmentation[np.asarray(co2.img, dtype=bool)] = 1
            segmentation[np.asarray(co2_gas.img, dtype=bool)] = 2
            out = self.path_to_results / "npy_segmentation"
            out.mkdir(parents=True, exist_ok=True)
            np.save(out / f"{img_id}_segmentation.npy", segmentation)

        return co2, co2_gas
