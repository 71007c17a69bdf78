"""Heterogeneous (per-label) color-path concentration analysis.

Parity: reference
``presets/workflows/heterogeneous_color_analysis.py:45-934``.  The
reference's interactive matplotlib calibration loops (point-and-click
color paths, slider value tuning) are replaced by programmatic
counterparts taking explicit color paths / values.
"""

from __future__ import annotations

import copy
from typing import Optional

import numpy as np

from ...analysis.concentrationanalysis import ConcentrationAnalysis
from ...signals.color.color_mode import ColorMode
from ...signals.color.color_path import ColorPath, define_color_path
from ...signals.models.basemodel import HeterogeneousModel
from ...signals.models.clipmodel import ClipModel
from ...signals.models.color_path_interpolation import ColorPathInterpolation
from ...signals.models.combinedmodel import CombinedModel

__all__ = ["HeterogeneousColorAnalysis"]


def _default_interpolation(color_mode: ColorMode) -> ColorPathInterpolation:
    return ColorPathInterpolation(
        color_path=ColorPath(
            colors=[0.0 * np.ones(3), 0.5 * np.ones(3), 1.0 * np.ones(3)],
            base_color=np.zeros(3),
            mode="rgb",
        ),
        color_mode=color_mode,
    )


class HeterogeneousColorAnalysis(ConcentrationAnalysis):
    """Color-based concentration analysis with per-label color paths."""

    def __init__(
        self,
        baseline,
        labels,
        color_mode: ColorMode,
        color_path_functions: Optional[dict] = None,
        restoration=None,
        ignore_labels: Optional[list] = None,
    ) -> None:
        model = CombinedModel(
            [
                HeterogeneousModel(
                    _default_interpolation(color_mode),
                    labels,
                    ignore_labels=ignore_labels,
                ),
                ClipModel(min_value=0.0, max_value=None),
            ]
        )
        config = {"diff option": "plain", "restoration -> model": False}
        super().__init__(
            base=baseline if color_mode == ColorMode.RELATIVE else None,
            restoration=restoration,
            labels=labels,
            model=model,
            **config,
        )
        self.color_mode = color_mode
        labels_arr = np.asarray(
            labels.img if hasattr(labels, "img") else labels
        )
        self.color_path_associations = np.zeros(
            np.unique(labels_arr).size, dtype=int
        )
        self.color_path_functions: list = []
        if color_path_functions:
            self.color_path_associations = np.unique(labels_arr).astype(int)
            self.color_path_functions = list(color_path_functions.values())
            for label, function in color_path_functions.items():
                self.model[0][label] = copy.copy(function)

    # ------------------------------------------------------------ calibrate

    def define_color_path(
        self, image, mask, num_colors: int = 5, name: str = "ColorPath"
    ) -> ColorPath:
        """Derive a color path from masked pixels (programmatic counterpart
        of the reference's interactive picker)."""
        data = image
        if self.color_mode == ColorMode.RELATIVE and self.base is not None:
            data = image.copy()
            data.img = np.asarray(image.img) - np.asarray(self.base.img)
        return define_color_path(data, mask, num_colors=num_colors, name=name)

    def global_calibration_colors(
        self, image, mask, color_path: Optional[ColorPath] = None
    ) -> None:
        """Assign one (derived or given) color path to all labels
        (reference heterogeneous_color_analysis.py:184-213)."""
        if color_path is None:
            color_path = self.define_color_path(image, mask)
        self.global_color_path = color_path
        self.color_paths = [color_path]
        labels_arr = np.asarray(self.labels.img)
        self.color_path_associations = np.zeros(
            np.unique(labels_arr).size, dtype=int
        )
        for label in np.unique(labels_arr):
            self._assign_color_path(int(label), color_path)

    def _assign_color_path(self, label: int, color_path: ColorPath) -> None:
        model = self.model[0][label]
        model.color_path = copy.copy(color_path)
        # A path with a different node count invalidates the value table.
        if len(model.values) != color_path.num_segments + 1:
            model.values = np.asarray(color_path.equidistant_distances)

    def local_calibration_colors(
        self, label: int, image, mask, color_path: Optional[ColorPath] = None
    ) -> None:
        """Assign a dedicated color path to one label
        (reference heterogeneous_color_analysis.py:213-249)."""
        if color_path is None:
            color_path = self.define_color_path(image, mask)
        if not hasattr(self, "color_paths"):
            self.color_paths = []
        self.color_paths.append(color_path)
        self.color_path_associations[int(label)] = len(self.color_paths) - 1
        self._assign_color_path(int(label), color_path)

    def local_calibration_values(self, label: int, values) -> None:
        """Set the interpolation values of one label's path
        (reference heterogeneous_color_analysis.py:249-423 slider UI)."""
        self.model[0][int(label)].update_model_parameters(values)

    def calibration_values(
        self,
        image,
        initial_color_path_idx: int = 0,
        values: Optional[dict] = None,
    ) -> dict:
        """Tune per-color-path interpolation values (reference
        heterogeneous_color_analysis.py:749-860, an interactive slider
        loop; here headless).  ``values`` maps color-path index -> new
        value table; each update is pushed to every label associated with
        that path.  Returns concentration previews (path index ->
        concentration array) so a caller can iterate
        propose -> preview -> accept."""
        values = values or {}
        for idx, new_values in values.items():
            idx = int(idx)
            for label in np.where(self.color_path_associations == idx)[0]:
                self.model[0][int(label)].update_model_parameters(
                    np.asarray(new_values, dtype=float)
                )
        previews: dict = {}
        concentration = self(image)
        data = np.asarray(concentration.img)
        labels_arr = np.asarray(self.labels.img)
        indices = (
            sorted({int(i) for i in values})
            if values
            else [int(initial_color_path_idx)]
        )
        for idx in indices:
            mask = np.zeros(labels_arr.shape, dtype=bool)
            for label in np.where(self.color_path_associations == idx)[0]:
                mask |= labels_arr == label
            previews[idx] = np.where(mask, data, 0.0)
        return previews

    def global_calibration_flash(
        self,
        mass_computation,
        mask,
        calibration_images: list,
        experiment,
        cmap=None,
        show: bool = False,
    ) -> dict:
        """Coarse global tuning of the signal-to-mass chain (reference
        heterogeneous_color_analysis.py:423-608): run the calibration
        images through the analysis + mass computation, compare the
        integrated mass against the injection protocol, and report the
        time series + square error (the reference renders the same series
        in a matplotlib session)."""
        times, expected, integrated = [], [], []
        for img in calibration_images:
            time_h = (
                float(np.asarray(img.time)) / 3600.0
                if img.time is not None
                else 0.0
            )
            signal = self(img)
            times.append(time_h)
            expected.append(
                float(experiment.injection_protocol.injected_mass(time=time_h))
            )
            integrated.append(float(mass_computation.integrated_mass(signal)))
        square_error = float(
            np.sum((np.asarray(integrated) - np.asarray(expected)) ** 2)
        )
        history = {
            "times": times,
            "expected_mass": expected,
            "integrated_mass": integrated,
            "square_error": square_error,
        }
        self.calibration_history = history
        if show:  # pragma: no cover - visual
            import matplotlib.pyplot as plt

            plt.figure("Global flash calibration")
            plt.plot(times, expected, label="expected", color="k")
            plt.plot(times, integrated, label="integrated", color="b")
            plt.legend()
            plt.show()
        return history

    def local_calibration_flash(
        self,
        mass_computation,
        mask,
        calibration_images: list,
        cmap=None,
        show: bool = False,
    ) -> None:
        """Reference parity stub: the upstream method is itself
        unimplemented (``assert False, "continue here"``, reference
        heterogeneous_color_analysis.py:609-633).  Use
        :meth:`local_calibration_colors` + :meth:`global_calibration_flash`
        for the same effect."""
        raise NotImplementedError(
            "local_calibration_flash is unimplemented upstream "
            "(heterogeneous_color_analysis.py:609-633); combine "
            "local_calibration_colors with global_calibration_flash."
        )

    def local_calibration_color_path(
        self,
        image,
        mask,
        label: Optional[int] = None,
        label_box: Optional[tuple] = None,
    ) -> int:
        """Define a dedicated color path for one label (reference
        heterogeneous_color_analysis.py:634-748 picks the label with a
        rectangle-selection event loop; here the label — or a voxel-slice
        box whose dominant label is used — is given programmatically).
        Returns the chosen label."""
        if label is None:
            assert label_box is not None, (
                "Provide label= or label_box= (headless redesign of the "
                "reference's interactive rectangle selection)."
            )
            labels_arr = np.asarray(self.labels.img)
            label = int(np.argmax(np.bincount(labels_arr[label_box].ravel())))
        self.local_calibration_colors(int(label), image, mask)
        return int(label)

    def update_color_path_function(self, label: int, function) -> None:
        self.model[0][int(label)] = copy.copy(function)
        self.color_path_functions.append(function)

    # ------------------------------------------------------------------- I/O

    def save(self, path) -> None:
        """Persist the per-label color-path calibration as JSON
        (reference heterogeneous_color_analysis.py:861-905): one entry per
        distinct path — base color, path colors, interpolation values and
        the labels sharing it."""
        import json
        from pathlib import Path

        paths = getattr(self, "color_paths", None)
        if not paths:
            raise ValueError(
                "Nothing to save: run global/local_calibration_colors first."
            )
        payload = {}
        for path_id, color_path in enumerate(paths):
            payload[str(path_id)] = {
                "base_color": np.asarray(color_path.base_color).tolist(),
                "colors": [np.asarray(c).tolist() for c in color_path.colors],
                "values": [],
                "values_per_label": {},
                "labels": [],
            }
        labels_arr = np.asarray(self.labels.img)
        for label in np.unique(labels_arr):
            path_id = int(self.color_path_associations[int(label)])
            payload[str(path_id)]["labels"].append(int(label))
            # Interpolation values are stored per label: labels sharing a
            # color path may have been tuned individually via
            # update_model_parameters, so a single shared table would
            # silently drop those differences on a save/load round-trip.
            model = self.model[0][int(label)]
            values = [float(v) for v in np.asarray(model.values).ravel()]
            payload[str(path_id)]["values_per_label"][str(int(label))] = values
            # Keep the legacy shared table for readers of the old format.
            payload[str(path_id)]["values"] = values
        out = Path(path).with_suffix(".json")
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(payload, indent=2))

    def load(self, path) -> None:
        """Restore a calibration saved by :meth:`save`."""
        import json
        from pathlib import Path

        data = json.loads(Path(path).with_suffix(".json").read_text())
        labels_arr = np.asarray(self.labels.img)
        self.color_paths = []
        self.color_path_associations = np.zeros(
            np.unique(labels_arr).size, dtype=int
        )
        for path_id, entry in data.items():
            color_path = ColorPath(
                colors=[np.asarray(c, dtype=float) for c in entry["colors"]],
                base_color=np.asarray(entry["base_color"], dtype=float),
                mode="rgb",
            )
            self.color_paths.append(color_path)
            per_label = entry.get("values_per_label", {})
            for label in entry["labels"]:
                self.color_path_associations[int(label)] = int(path_id)
                self._assign_color_path(int(label), color_path)
                values = per_label.get(str(int(label)), entry.get("values"))
                if values:
                    self.model[0][int(label)].update_model_parameters(
                        np.asarray(values, dtype=float)
                    )
