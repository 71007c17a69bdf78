"""Color -> pH -> flash -> mass analysis chain for heterogeneous media.

Parity: reference
``presets/workflows/heterogeneous_color_to_mass_analysis.py:33-2800``.
The ~2.4k-line interactive slider UI is replaced by the programmatic
``automatic_calibration`` (Nelder-Mead against injected mass, reference
:2551-2785) plus direct setters; the compute chain (__call__ :176) is
identical in structure.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np

from ...analysis.concentrationanalysis import ConcentrationAnalysis
from ...signals.color import ColorEmbeddingBasis, parse_color_embedding_basis
from ...signals.color.color_mode import ColorMode
from ...signals.models.basemodel import HeterogeneousModel
from ...signals.models.clipmodel import ClipModel
from ...signals.models.combinedmodel import CombinedModel
from .simple_run_analysis import SimpleRunAnalysis

logger = logging.getLogger(__name__)

__all__ = [
    "HeterogeneousColorToMassAnalysis",
    "HeterogeneousCalibrationSession",
]


class HeterogeneousColorToMassAnalysis:
    """Full mass pipeline: color interpretation -> pH -> flash -> mass."""

    def __init__(
        self,
        baseline,
        labels,
        color_mode: ColorMode,
        color_path_interpretation: dict,
        signal_functions: dict,
        flash,
        co2_mass_analysis,
        geometry,
        restoration=None,
        ignore_labels: Optional[list] = None,
        basis: ColorEmbeddingBasis = ColorEmbeddingBasis.LABELS,
        expert_knowledge_adapter=None,
        contour_smoother=None,
    ) -> None:
        base_model = CombinedModel(
            [
                HeterogeneousModel(
                    color_path_interpretation,
                    labels,
                    ignore_labels=ignore_labels,
                )
            ]
        )
        config = {"diff option": "plain", "restoration -> model": False}
        self.color_analysis = ConcentrationAnalysis(
            base=baseline if color_mode == ColorMode.RELATIVE else None,
            restoration=None,
            model=base_model,
            labels=labels,
            **config,
        )

        # Clip color signals into the common domain of the signal functions.
        min_domain = max(
            min(np.asarray(f.supports)) for f in signal_functions.values()
        )
        max_domain = min(
            max(np.asarray(f.supports)) for f in signal_functions.values()
        )
        min_range = min(
            min(np.asarray(f.values)) for f in signal_functions.values()
        )
        max_range = max(
            max(np.asarray(f.values)) for f in signal_functions.values()
        )
        self.signal_model_extents = ((min_domain, max_domain), (min_range, max_range))

        signal_model = CombinedModel(
            [
                ClipModel(min_domain, max_domain),
                HeterogeneousModel(
                    signal_functions, labels, ignore_labels=ignore_labels
                ),
            ]
        )
        self.signal_model = ConcentrationAnalysis(
            base=None,
            restoration=restoration,
            model=signal_model,
            labels=labels,
            **config,
        )

        self.flash = flash
        self.co2_mass_analysis = co2_mass_analysis
        self.geometry = geometry
        self.original_depth = geometry.depth.copy()
        self.analysis = SimpleRunAnalysis(self.geometry)
        self.color_path_interpretation = color_path_interpretation
        self.basis = parse_color_embedding_basis(basis)
        self.expert_knowledge_adapter = expert_knowledge_adapter
        self.contour_smoother = contour_smoother
        self.ignore_labels = list(ignore_labels or [])

    # ------------------------------------------------------------ pipeline

    @property
    def labels(self):
        assert self.color_analysis.labels is not None
        return self.color_analysis.labels

    def call_color_interpretation(self, image):
        return self.color_analysis(image)

    def call_pH_analysis(self, color_interpretation):
        return self.signal_model(color_interpretation)

    def call_flash_and_mass_analysis(self, pH):
        c_aq, s_g = self.flash(pH)
        if self.expert_knowledge_adapter is not None:
            c_aq = self.expert_knowledge_adapter.apply(c_aq, "concentration_aq")
            s_g = self.expert_knowledge_adapter.apply(s_g, "saturation_g")
        return self.co2_mass_analysis.mass_analysis(c_aq=c_aq, s_g=s_g)

    def __call__(self, image):
        color_interpretation = self.call_color_interpretation(image)
        pH = self.call_pH_analysis(color_interpretation)
        return self.call_flash_and_mass_analysis(pH)

    # ------------------------------------------------------------ setters

    def update_signal_function(self, label: int, values=None, supports=None):
        self.signal_model.model[1][int(label)].update(
            supports=supports, values=values
        )

    def update_flash(self, **kwargs) -> None:
        self.flash.update(**kwargs)

    # ------------------------------------------------------------ calibrate

    def manual_calibration_session(
        self, images: list, experiment, log=None
    ) -> "HeterogeneousCalibrationSession":
        """Headless equivalent of the reference's manual slider UI
        (reference :183-2550): a propose -> preview -> accept stepper over
        the per-label signal functions and flash bounds.  The expensive
        color interpretation is cached per image; each proposal re-runs
        only the pH/flash/mass tail."""
        return HeterogeneousCalibrationSession(self, images, experiment, log)

    def manual_calibration(
        self,
        images: list,
        experiment,
        rois: Optional[dict] = None,
        cmap=None,
    ) -> "HeterogeneousCalibrationSession":
        """Reference-named entry point (reference :183-2550).  The
        upstream method blocks in a matplotlib event loop; the headless
        redesign hands back the stepper session instead — drive it with
        ``propose``/``preview``/``accept`` (``rois``/``cmap`` are accepted
        for signature parity; per-ROI plots are not reproduced)."""
        return self.manual_calibration_session(images, experiment)

    def automatic_calibration(
        self,
        images: list,
        experiment,
        rois: Optional[dict] = None,
        maxiter: int = 10,
    ) -> None:
        """Optimize signal-function values + flash bounds against the
        injected mass (reference :2551-2785, Nelder-Mead over monotone
        value increments)."""
        from scipy.optimize import minimize

        available_labels = np.sort(
            [
                l
                for l in self.signal_model.model[1].keys()
                if l not in self.ignore_labels
            ]
        )
        color_interpretations = [
            self.call_color_interpretation(image) for image in images
        ]
        times = [
            float(np.asarray(img.time)) / 3600.0 if img.time is not None else 0.0
            for img in images
        ]
        expected = [
            float(experiment.injection_protocol.injected_mass(time=t))
            for t in times
        ]

        initial_dofs = np.hstack(
            [
                np.diff(np.asarray(self.signal_model.model[1][l].values))
                for l in available_labels
            ]
            + [
                self.flash.min_value_aq,
                self.flash.max_value_aq - self.flash.min_value_aq,
                self.flash.min_value_g,
                self.flash.max_value_g - self.flash.min_value_g,
            ]
        )
        logger.info("Number of DOFs for optimization: %d", len(initial_dofs))

        def _install(dofs: np.ndarray) -> None:
            idx = 0
            for label in available_labels:
                num_values = len(
                    np.asarray(self.signal_model.model[1][label].values)
                )
                new_values = np.cumsum(
                    np.hstack([0.0, np.abs(dofs[idx : idx + num_values - 1])])
                )
                self.signal_model.model[1][label].update(values=new_values)
                idx += num_values - 1
            self.flash.update(
                min_value_aq=dofs[-4],
                max_value_aq=dofs[-4] + abs(dofs[-3]),
                min_value_g=dofs[-2],
                max_value_g=dofs[-2] + abs(dofs[-1]),
            )

        def objective(dofs: np.ndarray) -> float:
            _install(dofs)
            error = 0.0
            for interp, mass_expected in zip(color_interpretations, expected):
                pH = self.call_pH_analysis(interp)
                result = self.call_flash_and_mass_analysis(pH)
                integrated = float(self.geometry.integrate(result.mass))
                error += abs(integrated - mass_expected) / max(
                    mass_expected, 1e-12
                )
            return error

        result = minimize(
            objective,
            initial_dofs,
            method="Nelder-Mead",
            bounds=[(0, 1)] * len(initial_dofs),
            options={"maxiter": maxiter, "xatol": 1e-6, "fatol": 1e-6},
        )
        _install(result.x)
        logger.info("Calibration finished: %s", result.message)

    # ------------------------------------------------------------------- io

    def save(self, folder: Path) -> None:
        """Persist signal functions + flash (reference :2785-2880)."""
        folder = Path(folder)
        folder.mkdir(parents=True, exist_ok=True)
        for label in self.signal_model.model[1].keys():
            self.signal_model.model[1][label].save(
                folder / f"signal_function_{label}.csv"
            )
        self.flash.save(folder / "flash.npz")
        for label, interpretation in self.color_path_interpretation.items():
            interpretation.save(folder / f"color_interpretation_{label}.json")

    @classmethod
    def from_folder(
        cls,
        folder: Path,
        baseline,
        labels,
        co2_mass_analysis,
        geometry,
        restoration=None,
        basis: ColorEmbeddingBasis = ColorEmbeddingBasis.LABELS,
        expert_knowledge_adapter=None,
        contour_smoother=None,
        color_mode: ColorMode = ColorMode.RELATIVE,
        flash=None,
    ) -> "HeterogeneousColorToMassAnalysis":
        """Construct a chain from a saved calibration folder
        (reference HeterogeneousColorToMassAnalysis.load)."""
        from ...multiphase.flash import SimpleFlash
        from ...signals.models.color_path_interpolation import (
            ColorPathInterpolation,
        )
        from ...signals.models.pwtransformation import PWTransformation

        folder = Path(folder)
        interpretations = {}
        for file in sorted(folder.glob("color_interpretation_*.json")):
            label = int(file.stem.split("_")[-1])
            interpretations[label] = ColorPathInterpolation.load(file)
        signal_functions = {}
        for file in sorted(folder.glob("signal_function_*.csv")):
            label = int(file.stem.split("_")[-1])
            signal_functions[label] = PWTransformation.load(file)
        if not interpretations or not signal_functions:
            raise FileNotFoundError(
                f"No calibrated color-to-mass data found in {folder}."
            )
        if flash is None:
            flash = SimpleFlash(0.0, 1.0, 1.0, 2.0)
            if (folder / "flash.npz").exists():
                flash.load(folder / "flash.npz")
        return cls(
            baseline=baseline,
            labels=labels,
            color_mode=color_mode,
            color_path_interpretation=interpretations,
            signal_functions=signal_functions,
            flash=flash,
            co2_mass_analysis=co2_mass_analysis,
            geometry=geometry,
            restoration=restoration,
            basis=basis,
            expert_knowledge_adapter=expert_knowledge_adapter,
            contour_smoother=contour_smoother,
        )

    def load(self, folder: Path) -> None:
        from ...signals.models.color_path_interpolation import (
            ColorPathInterpolation,
        )
        from ...signals.models.pwtransformation import PWTransformation

        folder = Path(folder)
        for file in folder.glob("signal_function_*.csv"):
            label = int(file.stem.split("_")[-1])
            self.signal_model.model[1][label] = PWTransformation.load(file)
        self.flash.load(folder / "flash.npz")
        for file in folder.glob("color_interpretation_*.json"):
            label = int(file.stem.split("_")[-1])
            interpretation = ColorPathInterpolation.load(file)
            self.color_path_interpretation[label] = interpretation
            self.color_analysis.model[0][label] = interpretation


class HeterogeneousCalibrationSession:
    """Propose -> preview -> accept stepper for the heterogeneous chain.

    Headless redesign of the reference's ~2,400-line manual calibration UI
    (reference heterogeneous_color_to_mass_analysis.py:183-2550): every
    control the sliders expose — per-label signal-function values and the
    flash bounds — is a keyword of :meth:`propose`; :meth:`preview`
    returns (and optionally plots) detected vs expected masses;
    :meth:`accept` persists the iteration log.
    """

    def __init__(self, chain, images: list, experiment, log=None) -> None:
        self.chain = chain
        self.log = Path(log) if log is not None else None
        self.iterations: list[dict] = []
        # Cache the expensive color interpretation once (the reference UI
        # does the same before opening the sliders, :2450).
        self.color_interpretations = [
            chain.call_color_interpretation(image) for image in images
        ]
        self.times = [
            float(np.asarray(img.time)) / 3600.0 if img.time is not None else 0.0
            for img in images
        ]
        self.expected = [
            float(experiment.injection_protocol.injected_mass(time=t))
            for t in self.times
        ]

    def _evaluate(self) -> dict:
        detected = []
        for interp in self.color_interpretations:
            pH = self.chain.call_pH_analysis(interp)
            result = self.chain.call_flash_and_mass_analysis(pH)
            detected.append(float(self.chain.geometry.integrate(result.mass)))
        detected_arr = np.asarray(detected)
        expected_arr = np.asarray(self.expected)
        rel = np.abs(detected_arr - expected_arr) / np.maximum(
            expected_arr, 1e-12
        )
        return {
            "time": np.asarray(self.times),
            "detected_mass": detected_arr,
            "expected_mass": expected_arr,
            "error": float(np.square(detected_arr - expected_arr).sum()),
            "relative_errors": rel,
        }

    def propose(
        self,
        signal_values: Optional[dict] = None,
        flash_bounds: Optional[dict] = None,
    ) -> dict:
        """Apply slider moves: per-label signal-function values and/or
        flash bounds (min/max_value_aq, min/max_value_g)."""
        if signal_values:
            for label, values in signal_values.items():
                self.chain.update_signal_function(int(label), values=values)
        if flash_bounds:
            self.chain.update_flash(**flash_bounds)
        metrics = self._evaluate()
        self.iterations.append(
            {
                "iteration": len(self.iterations),
                "error": metrics["error"],
                "signal_values": {
                    int(l): np.array(
                        self.chain.signal_model.model[1][l].values, copy=True
                    )
                    for l in self.chain.signal_model.model[1].keys()
                },
            }
        )
        return metrics

    def preview(self, path=None) -> dict:
        metrics = self._evaluate()
        if path is not None:
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            ax.plot(metrics["time"], metrics["detected_mass"], "o-",
                    label="detected")
            ax.plot(metrics["time"], metrics["expected_mass"], "k--",
                    label="expected")
            ax.set_xlabel("time [h]")
            ax.set_ylabel("mass [kg]")
            ax.legend()
            fig.savefig(Path(path))
            plt.close(fig)
        return metrics

    def accept(self):
        if self.log is not None:
            self.log.mkdir(parents=True, exist_ok=True)
            np.savez(
                self.log / "calibration_log.npz",
                error=np.asarray([it["error"] for it in self.iterations]),
            )
            self.chain.save(self.log / "calibrated")
        return self.chain
