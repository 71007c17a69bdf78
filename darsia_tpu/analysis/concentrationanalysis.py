"""Concentration analysis: image -> physical concentration maps.

Parity: reference
``src/darsia/multi_image_analysis/concentrationanalysis.py:22-486``.

The signal pipeline — baseline subtraction, scalar reduction, cleaning,
balancing, restoration (TVD), model conversion — composes pure JAX stages,
so for fixed configuration the whole per-image computation fuses under jit.
"""

from __future__ import annotations

import copy
import logging
from pathlib import Path
from typing import Optional, Union
from warnings import warn

import jax.numpy as jnp
import numpy as np

from ..image.image import Image, ScalarImage

logger = logging.getLogger(__name__)

__all__ = ["ConcentrationAnalysis", "PriorPosteriorConcentrationAnalysis"]


class ConcentrationAnalysis:
    """Determine concentration/saturation maps from image comparison."""

    def __init__(
        self,
        base=None,
        signal_reduction=None,
        balancing=None,
        restoration=None,
        model=None,
        labels=None,
        **kwargs,
    ) -> None:
        self.base: Optional[Image] = None
        self._base_collection: list = []
        if base is not None:
            if not isinstance(base, list):
                base = [base]
            if any(
                not np.issubdtype(np.asarray(img.img).dtype, np.floating)
                for img in base
            ):
                base = [img.img_as(np.float32) for img in base]
                warn("The baseline image needed to be converted to float.")
            self.base = base[0].copy()
            self._base_collection = base
            if self.base.space_dim != 2:
                raise NotImplementedError

        self.signal_reduction = signal_reduction
        self.balancing = balancing
        self.model = model
        self.restoration = restoration
        self.labels = labels
        self._diff_option = kwargs.get("diff option", "absolute")
        self.first_restoration_then_model = kwargs.get("restoration -> model", False)

        self.find_cleaning_filter()

        self.mask = (
            None
            if self.base is None
            else np.ones(self.base.img.shape[:2], dtype=bool)
        )
        self.verbosity: int = kwargs.get("verbosity", 0)

    def update(self, base=None, mask=None) -> None:
        """Update the baseline image and/or analysis mask."""
        if base is not None:
            if not np.issubdtype(np.asarray(base.img).dtype, np.floating):
                base = base.img_as(np.float32)
            self.base = base.copy()
        if mask is not None:
            self.mask = mask

    # ------------------------------------------------------ cleaning filter

    def find_cleaning_filter(self, baseline_images: Optional[list] = None) -> None:
        """Learn structural noise thresholds from extra baseline images."""
        if baseline_images is None and self.base is not None:
            baseline_images = self._base_collection[1:]
            if len(baseline_images) == 0:
                baseline_images = None

        self.threshold_cleaning_filter = None
        if baseline_images is not None:
            cleaning = jnp.zeros(self.base.img.shape[:2], dtype=jnp.float32)
            for img in baseline_images:
                diff = self._subtract_background(img.copy())
                monochromatic_diff = self._reduce_signal(diff)
                cleaning = jnp.maximum(cleaning, monochromatic_diff)
            self.threshold_cleaning_filter = cleaning

    def read_cleaning_filter_from_file(self, path) -> None:
        data = np.load(path)
        if self.base is not None:
            base_shape = self.base.img.shape[:2]
            if data.shape[:2] != base_shape:
                from ..ops.resize import resize_array

                data = np.asarray(
                    resize_array(jnp.asarray(data), base_shape, "inter_linear")
                )
        self.threshold_cleaning_filter = jnp.asarray(data)

    def write_cleaning_filter_to_file(self, path_to_filter) -> None:
        path_to_filter = Path(path_to_filter)
        path_to_filter.parent.mkdir(parents=True, exist_ok=True)
        np.save(path_to_filter, np.asarray(self.threshold_cleaning_filter))

    # ----------------------------------------------------------------- main

    def __call__(self, img: Image) -> Image:
        """Extract concentration from a probe image."""
        if not np.issubdtype(np.asarray(img.img).dtype, np.floating):
            probe_img = copy.deepcopy(img).img_as(np.float32)
            warn("The input for concentration analysis needed to be converted.")
        else:
            probe_img = copy.deepcopy(img)

        diff = self._subtract_background(probe_img)
        self._inspect(diff, title="Difference")

        signal = self._reduce_signal(diff)
        self._inspect(signal, title="Scalar signal")

        clean_signal = self._clean_signal(signal)
        self._inspect(clean_signal, title="Clean signal")

        balanced_signal = self._balance_signal(clean_signal)
        self._inspect(balanced_signal, title="Balanced signal")

        if self.first_restoration_then_model:
            smooth_signal = self._restore_signal(balanced_signal)
            concentration = self._convert_signal(smooth_signal, diff)
        else:
            nonsmooth_concentration = self._convert_signal(balanced_signal, diff)
            concentration = self._restore_signal(nonsmooth_concentration)

        concentration = jnp.asarray(concentration)
        metadata = img.metadata()
        is_scalar = len(concentration.shape) == len(img.shape) - 1
        is_effectively_scalar = (
            not is_scalar and concentration.shape[-1] == 1
        )
        if is_scalar:
            return ScalarImage(concentration, **metadata)
        if is_effectively_scalar:
            return ScalarImage(concentration[..., 0], **metadata)
        return type(img)(concentration, **metadata)

    # ------------------------------------------------------ pipeline stages

    def _inspect(self, img, title: str) -> None:
        if self.verbosity >= 2:  # pragma: no cover - visual
            import matplotlib.pyplot as plt

            plt.figure(title)
            plt.imshow(np.asarray(img))

    def _subtract_background(self, img: Image) -> jnp.ndarray:
        data = jnp.asarray(img.img, dtype=jnp.float32)
        if self.base is None:
            reference = None
        else:
            reference = jnp.asarray(self.base.img, dtype=jnp.float32)
        if self._diff_option == "positive":
            diff = jnp.clip(data if reference is None else data - reference, 0, None)
        elif self._diff_option == "negative":
            diff = jnp.clip(-data if reference is None else reference - data, 0, None)
        elif self._diff_option == "absolute":
            diff = jnp.abs(data if reference is None else data - reference)
        elif self._diff_option == "plain":
            diff = data if reference is None else data - reference
        else:
            raise ValueError(f"Diff option {self._diff_option} not supported")
        return diff

    def _reduce_signal(self, img: jnp.ndarray) -> jnp.ndarray:
        return img if self.signal_reduction is None else self.signal_reduction(img)

    def _clean_signal(self, img: jnp.ndarray) -> jnp.ndarray:
        if self.threshold_cleaning_filter is None:
            return img
        return jnp.clip(img - self.threshold_cleaning_filter, 0, None)

    def _balance_signal(self, img: jnp.ndarray) -> jnp.ndarray:
        return img if self.balancing is None else self.balancing(img)

    def _restore_signal(self, signal: jnp.ndarray) -> jnp.ndarray:
        return signal if self.restoration is None else self.restoration(signal)

    def _convert_signal(self, signal: jnp.ndarray, diff: jnp.ndarray) -> jnp.ndarray:
        return signal if self.model is None else self.model(signal)


class PriorPosteriorConcentrationAnalysis(ConcentrationAnalysis):
    """Concentration analysis with a posterior review of the prior model."""

    def __init__(
        self,
        base,
        signal_reduction,
        balancing,
        restoration,
        prior_model,
        posterior_model,
        labels=None,
        **kwargs,
    ) -> None:
        self.posterior_model = posterior_model
        super().__init__(
            base, signal_reduction, balancing, restoration, prior_model, labels, **kwargs
        )

    def _convert_signal(self, signal, diff):
        prior = self.model(signal) if self.model is not None else signal
        # Posterior: criterion-based re-evaluation of the prior's connected
        # regions on the SMOOTH SIGNAL (+ original diff for transformed
        # criteria) — reference concentrationanalysis.py:489-493
        # ``posterior_model(signal, prior, diff)``.
        posterior = self.posterior_model(
            np.asarray(signal), np.asarray(prior) > 0, np.asarray(diff)
        )
        return jnp.asarray(posterior)
