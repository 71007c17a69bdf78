"""Relative (spatially varying polynomial) color correction.

Parity: reference ``src/darsia/corrections/color/relativecolorcorrection.py``.

A per-pixel 3x3 color matrix, whose entries vary over the image as a
polynomial in the coordinates (LinearApproximation), calibrated from sets of
"similar colors" sampled across calibration images.  The interactive
selection assistant of the reference is replaced by the programmatic
:meth:`add_calibration_data`; the calibration itself is a closed-form least
squares solve.  Application is a batched per-pixel matrix-vector product.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from ...utils.approximations import (
    LinearApproximation,
    PolynomialApproximationSpace,
)
from ..base import BaseCorrection

__all__ = ["RelativeColorCorrection"]


class RelativeColorCorrection(BaseCorrection):
    """Heterogeneous polynomial color correction."""

    def __init__(
        self,
        baseline=None,
        images=None,
        config: Optional[dict] = None,
    ) -> None:
        self.baseline = baseline
        self.calibration_images = (
            [images] if images is not None and hasattr(images, "img") else images
        )
        self.config = config if config is not None else {}
        self.correction = self.define_correction()
        self.data: list[tuple[np.ndarray, np.ndarray]] = []
        self.reference_data: list[np.ndarray] = []
        self._evaluated = None

    def define_correction(self) -> LinearApproximation:
        ansatz = self.config.get("method", "polynomial")
        if ansatz != "polynomial":
            raise ValueError(f"Ansatz {ansatz!r} is not supported.")
        degree = self.config.get("degree", 2)
        space = PolynomialApproximationSpace(degree)
        return LinearApproximation(space, (3, 3), domain="coordinates")

    # ------------------------------------------------------------ calibration

    def add_calibration_data(
        self,
        coordinates: np.ndarray,
        colors: np.ndarray,
        reference_color: np.ndarray,
    ) -> None:
        """Register a group of similar colors and their reference.

        Args:
            coordinates: (N, 2) physical coordinates of the samples.
            colors: (N, 3) observed colors at those positions.
            reference_color: (3,) color they all should map to.

        """
        self.data.append((np.asarray(coordinates, float), np.asarray(colors, float)))
        self.reference_data.append(np.asarray(reference_color, float))

    # -- sample-selection front-ends (reference
    # relativecolorcorrection.py:116-251).  The reference's are purely
    # interactive; here explicit ``samples`` (lists of slice tuples, the
    # BoxSelectionAssistant output format) enable headless use, and the
    # interactive assistant runs only when samples are omitted.

    @staticmethod
    def _sample_centers_and_colors(img, samples, debug: bool = False):
        from ...utils.extractcharacteristicdata import (
            extract_characteristic_data,
        )

        mid = lambda s: int(0.5 * (s.start + s.stop))  # noqa: E731
        centers = np.array([[mid(s[0]), mid(s[1])] for s in samples])
        colors = extract_characteristic_data(
            signal=np.asarray(img.img), samples=samples, show_plot=debug
        )
        return centers, np.asarray(colors)

    def define_similar_colors(self, samples_per_image=None) -> None:
        """Collect groups of similar colors across the calibration images
        (reference relativecolorcorrection.py:116-151)."""
        from ...assistants import BoxSelectionAssistant

        width = self.config.get("sample_size", 50)
        debug = self.config.get("debug", False)
        voxels, colors = [], []
        for k, img in enumerate(self.calibration_images):
            if samples_per_image is not None:
                samples = samples_per_image[k]
            else:  # pragma: no cover - interactive
                samples = BoxSelectionAssistant(img, width=width)()
            centers, sample_colors = self._sample_centers_and_colors(
                img, samples, debug
            )
            voxels.append(centers)
            colors.append(sample_colors)
        cs = self.calibration_images[0].coordinatesystem
        for vox, col in zip(voxels, colors):
            coords = np.asarray(cs.coordinate(vox), dtype=float)
            self.data.append((coords, np.asarray(col, float)))

    def define_reference_color(self, samples=None) -> None:
        """Pick the reference color from the first calibration image
        (reference relativecolorcorrection.py:153-178)."""
        from ...assistants import BoxSelectionAssistant

        width = self.config.get("sample_size", 50)
        debug = self.config.get("debug", False)
        img = self.calibration_images[0]
        if samples is None:  # pragma: no cover - interactive
            samples = BoxSelectionAssistant(img, width=width)()
        assert len(samples) > 0, "No samples selected."
        _, colors = self._sample_centers_and_colors(img, samples[:1], debug)
        self.reference_data.append(np.asarray(colors[0], float))

    def define_similar_and_reference_colors_tensorial(
        self, reference_samples=None, location_samples=None
    ) -> None:
        """Two-stage tensorial sampling: a grid of distinct colors on one
        checker + the same grid repeated across the image; the stage-1
        colors serve as references (reference
        relativecolorcorrection.py:180-251)."""
        from ...assistants import BoxSelectionAssistant

        width = self.config.get("sample_size", 50)
        debug = self.config.get("debug", False)
        img = self.calibration_images[0]
        if reference_samples is None:  # pragma: no cover - interactive
            reference_samples = BoxSelectionAssistant(img, width=width)()
        if location_samples is None:  # pragma: no cover - interactive
            location_samples = BoxSelectionAssistant(img, width=width)()
        ref_centers, ref_colors = self._sample_centers_and_colors(
            img, reference_samples, debug
        )
        loc_centers, _ = self._sample_centers_and_colors(
            img, location_samples, debug
        )
        # Tensorial fill-in: each reference color is observed at every
        # location, displaced by the checker-internal offset.
        cs = img.coordinatesystem
        origin = ref_centers[0]
        data = np.asarray(img.img)
        for ref_center, ref_color in zip(ref_centers, ref_colors):
            offset = ref_center - origin
            voxels = loc_centers + offset[None, :]
            voxels = np.clip(
                voxels,
                0,
                np.asarray(data.shape[:2]) - 1,
            ).astype(int)
            colors = data[voxels[:, 0], voxels[:, 1], :]
            coords = np.asarray(cs.coordinate(voxels), dtype=float)
            self.data.append((coords, np.asarray(colors, float)))
            self.reference_data.append(np.asarray(ref_color, float))

    def calibrate(self) -> None:
        """LS-fit the polynomial coefficients of the 3x3 correction field.

        For each sample: basis(coord)_i * C_i @ color = reference, linear in
        the stacked coefficients C.
        """
        assert self.data, "No calibration data provided."
        space = self.correction.space
        rows = []
        rhs = []
        for (coords, colors), ref in zip(self.data, self.reference_data):
            basis = np.stack(
                [space.basis(coords, i) for i in range(space.size)], axis=1
            )  # (N, S)
            for n in range(coords.shape[0]):
                # For each output channel r: sum_i b_i * C[i][r, :] @ color = ref[r]
                for r in range(3):
                    row = np.zeros((space.size, 3, 3))
                    row[:, r, :] = np.outer(basis[n], colors[n])
                    rows.append(row.ravel())
                    rhs.append(ref[r])
        A = np.stack(rows)
        b = np.asarray(rhs)
        sol, *_ = np.linalg.lstsq(A, b, rcond=None)
        self.correction.coefficients = sol.reshape(self.correction.shape)

    def setup(self) -> None:
        """Evaluate the correction field over the baseline's grid (cached)."""
        assert self.baseline is not None, "Baseline image required for setup."
        self._evaluated = jnp.asarray(
            self.correction.evaluate(self.baseline.coordinatesystem),
            dtype=jnp.float32,
        )

    # ------------------------------------------------------------ correction

    def correct_array(self, img: jnp.ndarray) -> jnp.ndarray:
        assert self._evaluated is not None, "Call setup() before correcting."
        img = jnp.asarray(img, dtype=jnp.float32)
        return jnp.einsum("ijkl,ijl->ijk", self._evaluated, img, precision="highest")

    # ------------------------------------------------------------------ I/O

    def save(self, path) -> None:
        from pathlib import Path

        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            class_name=type(self).__name__,
            coefficients=self.correction.coefficients,
            config=np.array([self.config], dtype=object),
        )

    def load(self, path) -> None:
        data = np.load(path, allow_pickle=True)
        self.config = data["config"][0]
        self.correction = self.define_correction()
        self.correction.coefficients = data["coefficients"]
        if self.baseline is not None:
            self.setup()
