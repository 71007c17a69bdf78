"""Algorithmic color-path regression for labeled images.

Parity: reference ``signals/color/color_path_regression.py:25-2012``
(LabelColorPathMapRegression).  The reference couples the regression with a
~1.5k-line interactive matplotlib editor; here the pipeline is fully
programmatic:

  base colors -> per-label relative color spectra -> weighted 1D embedding
  -> piecewise-linear path nodes -> Lloyd refinement -> ColorPath per label.

TPU deviation: sklearn's LocallyLinearEmbedding is replaced by a weighted
PCA embedding oriented away from the origin; the greedy segment-splitting
of the reference is replaced by weighted-quantile node seeding plus a few
Lloyd iterations (projection uses the same vectorized closest-point program
as ColorPath.fit).
"""

from __future__ import annotations

from pathlib import Path
from typing import Literal, Optional

import numpy as np

from .color_mode import ColorMode
from .color_path import ColorPath
from .color_range import ColorSpectrum, DiscreteColorRange
from .label_maps import LabelColorMap, LabelColorPathMap, LabelColorSpectrumMap
from .utils import get_mean_color

__all__ = ["LabelColorPathMapRegression"]


class LabelColorPathMapRegression:
    """Regress relative color paths per label from calibration images."""

    def __init__(
        self,
        labels,
        color_range=None,
        resolution: int = 11,
        mask=None,
        ignore_labels: Optional[list] = None,
        color_mode: ColorMode = ColorMode.RELATIVE,
    ) -> None:
        self.labels = labels
        self.color_range = color_range
        self.resolution = resolution
        self.mask = mask
        self.ignore_labels = list(ignore_labels or [])
        self.color_mode = (
            getattr(color_range, "color_mode", None) or color_mode
        )
        if self.color_mode != ColorMode.RELATIVE:
            raise NotImplementedError(
                "Color path regression only implemented for RELATIVE mode."
            )

    # ----------------------------------------------------------- base color

    def _labels_array(self) -> np.ndarray:
        return np.asarray(
            self.labels.img if hasattr(self.labels, "img") else self.labels
        )

    def _mask_array(self) -> np.ndarray:
        if self.mask is None:
            return np.ones(self._labels_array().shape, dtype=bool)
        return np.asarray(
            self.mask.img if hasattr(self.mask, "img") else self.mask, dtype=bool
        )

    def get_base_colors(self, image) -> LabelColorMap:
        """Median color per label under the mask (reference
        color_path_regression.py:62-98)."""
        labels = self._labels_array()
        mask = self._mask_array()
        base_colors = {}
        for label in np.unique(labels):
            label = int(label)
            if label in self.ignore_labels:
                base_colors[label] = np.zeros(3)
                continue
            region = mask & (labels == label)
            if not np.any(region):
                base_colors[label] = np.zeros(3)
                continue
            base_colors[label] = get_mean_color(image, mask=region)
        return LabelColorMap(base_colors)

    def get_mean_base_color(self, image) -> np.ndarray:
        base_colors = self.get_base_colors(image)
        return np.mean(np.stack(list(base_colors.values())), axis=0)

    def base_color_image(self, image):
        """Image with each label painted by its base color."""
        base_colors = self.get_base_colors(image)
        labels = self._labels_array()
        out = image.copy()
        data = np.asarray(out.img).copy()
        for label, color in base_colors.items():
            data[labels == label] = color
        out.img = data
        return out

    # ------------------------------------------------------------- spectrum

    def get_color_spectrum(
        self,
        images: list,
        baseline=None,
        ignore=None,
        threshold_zero: float = 0.0,
        threshold_significant: float = 0.0,
        path: Optional[Path] = None,
        verbose: bool = False,
    ) -> LabelColorSpectrumMap:
        """Per-label spectra of relative colors across calibration images
        (reference color_path_regression.py:129-343)."""
        labels = self._labels_array()
        mask = self._mask_array()
        unique_labels = [int(l) for l in np.unique(labels)]

        if baseline is None:
            base_colors = LabelColorMap(
                {label: np.zeros(3) for label in unique_labels}
            )
            base_arr = None
        else:
            base_colors = self.get_base_colors(baseline)
            base_arr = np.asarray(baseline.img, dtype=float)

        box = 1.0
        if self.color_range is not None:
            box_lo = np.asarray(self.color_range.min_color)
            box_hi = np.asarray(self.color_range.max_color)
        else:
            box_lo, box_hi = -box * np.ones(3), box * np.ones(3)

        spectra = LabelColorSpectrumMap()
        for label in unique_labels:
            spectrum = ColorSpectrum(
                resolution=self.resolution, base_color=base_colors[label]
            )
            spectrum.min_color = box_lo
            spectrum.max_color = box_hi
            spectra[label] = spectrum

        for image in images:
            data = np.asarray(image.img, dtype=float)
            relative = data - base_arr if base_arr is not None else data.copy()
            relative[~mask] = 0.0
            for label in unique_labels:
                colors = relative[labels == label].reshape(-1, 3)
                if threshold_zero > 0.0:
                    colors = colors[
                        np.linalg.norm(colors, axis=1) > threshold_zero
                    ]
                if colors.size:
                    spectra[label].accumulate(colors)

        for label in unique_labels:
            if ignore is not None:
                ignore_spectrum = (
                    ignore[label] if isinstance(ignore, dict) else ignore
                )
                spectra[label].remove(ignore_spectrum)
            spectra[label].threshold(threshold_significant)

        if path is not None:
            spectra.save(path)
        return spectra

    def expand_color_spectrum(
        self, spectra, iterations: int = 1
    ) -> LabelColorSpectrumMap:
        """Dilate each label's occupancy in quantized color space
        (reference color_path_regression.py:343-534)."""
        out = LabelColorSpectrumMap()
        for label, spectrum in spectra.items():
            expanded = ColorSpectrum.from_dict(spectrum.to_dict())
            expanded.expand(iterations=iterations)
            # Expanded bins inherit the minimum observed count.
            floor = min(expanded.counts.values()) if expanded.counts else 1
            expanded.counts = {
                k: expanded.counts.get(k, floor) for k in expanded.occupancy
            }
            out[label] = expanded
        return out

    # -------------------------------------------------------------- fitting

    @staticmethod
    def _point_weights(
        spectrum: ColorSpectrum,
        weighting: Literal["threshold", "wls", "wls_sqrt", "wls_log"],
    ) -> np.ndarray:
        probs = spectrum.probabilities
        n = probs.shape[0]
        if weighting == "threshold":
            weights = np.ones(n)
        elif weighting == "wls":
            weights = probs
        elif weighting == "wls_sqrt":
            weights = np.sqrt(probs)
        elif weighting == "wls_log":
            weights = np.log1p(probs * max(n, 1))
        else:
            raise ValueError(f"Unknown weighting {weighting!r}.")
        total = weights.sum()
        return weights / total if total > 0 else np.full(n, 1.0 / max(n, 1))

    def _find_color_path(
        self,
        spectrum: ColorSpectrum,
        label: Optional[int] = None,
        ignore=None,
        num_segments: int = 1,
        name: str = "Color Path",
        weighting: Literal["threshold", "wls", "wls_sqrt", "wls_log"] = "threshold",
        lloyd_iterations: int = 3,
        **_ignored,
    ) -> ColorPath:
        """Fit one relative color path through a spectrum's occupied bins
        (reference color_path_regression.py:534-1476, non-interactive)."""
        num_dofs = num_segments + 1
        relative_colors = spectrum.relative_colors
        weights = self._point_weights(spectrum, weighting)
        if ignore is not None and relative_colors.shape[0]:
            keep = ~ignore.contains(spectrum.base_color + relative_colors)
            relative_colors = relative_colors[keep]
            weights = weights[keep]
        num_points = relative_colors.shape[0]

        if num_points <= 1:
            return ColorPath(
                base_color=spectrum.base_color,
                relative_colors=num_dofs * [np.zeros(3)],
                name=name,
            )

        weights = weights / max(weights.sum(), 1e-30)

        # Weighted PCA embedding to 1D, oriented so the origin sits at the
        # low end (paths start at the base color).
        mean = weights @ relative_colors
        centered = relative_colors - mean
        cov = (centered * weights[:, None]).T @ centered
        _, vecs = np.linalg.eigh(cov)
        direction = vecs[:, -1]
        embedding = centered @ direction
        origin_param = -mean @ direction
        if origin_param > weights @ embedding:
            embedding, origin_param = -embedding, -origin_param

        # Seed nodes at weighted quantiles of the embedding.
        order = np.argsort(embedding)
        cumw = np.cumsum(weights[order])
        cumw /= cumw[-1]
        node_colors = np.zeros((num_dofs, 3))
        node_colors[0] = np.zeros(3)  # start at the base color
        for i in range(1, num_dofs):
            q = i / num_segments
            idx = order[min(np.searchsorted(cumw, q), num_points - 1)]
            node_colors[i] = relative_colors[idx]

        # Lloyd refinement: project points on the current path, update the
        # interior+end nodes as weighted means of their parameter bins.
        for _ in range(lloyd_iterations):
            path = ColorPath(
                base_color=spectrum.base_color,
                relative_colors=[c for c in node_colors],
                name=name,
            )
            params = np.clip(
                path.fit(
                    relative_colors, ColorMode.RELATIVE, mode="equidistant"
                ),
                0.0,
                1.0,
            )
            for i in range(1, num_dofs):
                t_i = i / num_segments
                half = 0.5 / num_segments
                sel = np.abs(params - t_i) <= half
                w_sel = weights[sel]
                if w_sel.sum() > 1e-12:
                    node_colors[i] = (
                        w_sel @ relative_colors[sel]
                    ) / w_sel.sum()

        return ColorPath(
            base_color=spectrum.base_color,
            relative_colors=[c for c in node_colors],
            name=name,
        )

    def find_color_path(
        self,
        spectra,
        num_segments: int = 1,
        ignore=None,
        weighting: Literal["threshold", "wls", "wls_sqrt", "wls_log"] = "threshold",
        path: Optional[Path] = None,
        **kwargs,
    ) -> LabelColorPathMap:
        """Fit color paths for all labels (reference
        color_path_regression.py:1476-1538)."""
        color_paths = LabelColorPathMap()
        for label, spectrum in spectra.items():
            if label in self.ignore_labels:
                color_paths[label] = ColorPath(
                    base_color=spectrum.base_color,
                    relative_colors=(num_segments + 1) * [np.zeros(3)],
                    name=f"label_{label}",
                )
                continue
            ignore_spectrum = (
                ignore[label] if isinstance(ignore, dict) else ignore
            )
            color_paths[label] = self._find_color_path(
                spectrum,
                label=label,
                ignore=ignore_spectrum,
                num_segments=num_segments,
                name=f"label_{label}",
                weighting=weighting,
                **kwargs,
            )
        if path is not None:
            color_paths.save(path)
        return color_paths
