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
        fit_mode: Literal["rdp", "lloyd"] = "rdp",
        lloyd_iterations: int = 3,
        outlier_weight_ratio: float = 0.05,
        **_ignored,
    ) -> ColorPath:
        """Fit one relative color path through a spectrum's occupied bins
        (reference color_path_regression.py:534-1476, non-interactive).

        ``fit_mode="rdp"`` (default) runs the reference's
        Ramer-Douglas-Peucker-style weighted segmentation with
        outlier-robust quantile errors; ``"lloyd"`` runs the quantile-seed
        + Lloyd-refinement variant (cheaper, smoother paths).
        """
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

        # Outlier rejection: drop bins whose histogram weight is far below
        # the dominant path bins (only meaningful for count-based
        # weightings; "threshold" weights are uniform by construction).
        if weighting != "threshold" and num_points > 4:
            keep = weights >= outlier_weight_ratio * weights.max()
            if keep.sum() >= 2:
                relative_colors = relative_colors[keep]
                weights = weights[keep] / weights[keep].sum()
                num_points = relative_colors.shape[0]

        embedding = self._embed_1d(relative_colors, weights)

        if fit_mode == "rdp":
            node_colors = self._fit_path_rdp(
                relative_colors, weights, embedding, num_segments
            )
        else:
            node_colors = self._fit_path_lloyd(
                spectrum, relative_colors, weights, embedding,
                num_segments, lloyd_iterations, name,
            )

        return ColorPath(
            base_color=spectrum.base_color,
            relative_colors=[c for c in node_colors],
            name=name,
        )

    @staticmethod
    def _embed_1d(relative_colors: np.ndarray, weights: np.ndarray) -> np.ndarray:
        """Weighted-PCA 1D embedding oriented so the origin sits at the low
        end (paths start at the base color).

        TPU deviation: replaces sklearn's LocallyLinearEmbedding (reference
        color_path_regression.py:628-632) — on the near-1D manifolds of
        relative color clouds the principal direction gives the same
        ordering without the sklearn dependency.
        """
        mean = weights @ relative_colors
        centered = relative_colors - mean
        cov = (centered * weights[:, None]).T @ centered
        _, vecs = np.linalg.eigh(cov)
        direction = vecs[:, -1]
        embedding = centered @ direction
        origin_param = -mean @ direction
        if origin_param > weights @ embedding:
            embedding = -embedding
        return embedding

    def _fit_path_rdp(
        self,
        relative_colors: np.ndarray,
        weights: np.ndarray,
        embedding: np.ndarray,
        num_segments: int,
    ) -> np.ndarray:
        """Reference algorithm (color_path_regression.py:700-1370):

        1. sort colors along the embedding; trim everything left of the
           origin (closest point to zero relative color), flipping if the
           origin sits at the right end;
        2. prepend the exact origin with weight 0 (anchors the path at the
           base color without biasing the fit);
        3. greedy RDP-style segmentation: repeatedly split the segment with
           the largest 80th-quantile L1 linear-fit error (quantile = the
           outlier rejection) at the smoothed left/right error crossover;
        4. neighbor-pair re-splitting sweeps until converged or oscillating;
        5. key colors = segment endpoints.
        """
        order = np.argsort(embedding)
        sorted_colors = relative_colors[order]
        sorted_embedding = embedding[order]
        sorted_weights = weights[order]

        # Origin detection + trim (reference :855-905).
        origin = np.zeros(3)
        origin_index = int(
            np.argmin(np.linalg.norm(sorted_colors - origin, axis=1))
        )
        if origin_index > len(sorted_colors) // 2:
            origin_index = len(sorted_colors) - origin_index - 1
            sorted_embedding = np.flip(sorted_embedding, axis=0)
            sorted_colors = np.flip(sorted_colors, axis=0)
            sorted_weights = np.flip(sorted_weights, axis=0)
        sorted_embedding = sorted_embedding[origin_index:]
        sorted_colors = sorted_colors[origin_index:, :]
        sorted_weights = sorted_weights[origin_index:]

        # Prepend the origin with zero weight.
        sorted_embedding = np.hstack(
            (
                sorted_embedding[0]
                + np.sign(sorted_embedding[0] - sorted_embedding[-1]),
                sorted_embedding,
            )
        )
        sorted_colors = np.vstack((origin, sorted_colors))
        sorted_weights = np.hstack((0.0, sorted_weights))
        total = sorted_weights.sum()
        if total > 0:
            sorted_weights = sorted_weights / total

        def segment_error(rng: range) -> float:
            """Outlier-robust (80th-quantile) L1 linear-fit error.

            Chord-length parametrization in color space (instead of the
            raw embedding values) keeps collinear runs at exactly zero
            error regardless of how the points are spaced along the
            embedding — the prepended origin would otherwise skew the
            interpolation parameters.
            """
            idx = np.arange(rng.start, rng.stop)
            if len(idx) < 3:
                return 0.0
            c = sorted_colors[idx]
            seg_lens = np.linalg.norm(np.diff(c, axis=0), axis=1)
            t = np.concatenate([[0.0], np.cumsum(seg_lens)])
            span = t[-1]
            t = t / (span if span > 1e-30 else 1.0)
            pred = c[0] + np.outer(t, c[-1] - c[0])
            errors = np.abs(pred - c).sum(axis=1)
            return float(np.quantile(errors, 0.8))

        def segment_length(rng: range) -> float:
            return float(
                abs(sorted_embedding[rng.stop - 1] - sorted_embedding[rng.start])
            )

        def split_segment(rng: range):
            """Split at the smoothed left/right error crossover closest to
            the segment center (reference :932-1200)."""
            pts, left_err, right_err = [], [], []
            for split in range(1, len(rng) - 1):
                pts.append(split)
                left_err.append(segment_error(rng[:split]))
                right_err.append(segment_error(rng[split:]))
            pts = np.asarray(pts)
            left_err = np.asarray(left_err)
            right_err = np.asarray(right_err)

            if len(pts) >= 5:
                try:
                    from scipy.signal import savgol_filter

                    window = min(5, len(pts) if len(pts) % 2 else len(pts) - 1)
                    left_s = savgol_filter(left_err, window, polyorder=2)
                    right_s = savgol_filter(right_err, window, polyorder=2)
                except Exception:
                    left_s, right_s = left_err, right_err
            else:
                left_s, right_s = left_err, right_err

            diff = left_s - right_s
            crossings = np.where(np.diff(np.sign(diff)))[0]
            if len(crossings) == 0:
                split = int(pts[np.argmin(np.abs(diff))])
            else:
                center = len(rng) / 2
                split = int(
                    pts[crossings[np.argmin(np.abs(pts[crossings] - center))]]
                )
            left_rng, right_rng = rng[:split], rng[split:]
            return (
                {"range": left_rng, "error": segment_error(left_rng),
                 "length": segment_length(left_rng)},
                {"range": right_rng, "error": segment_error(right_rng),
                 "length": segment_length(right_rng)},
            )

        full = range(0, len(sorted_embedding))
        segments = [
            {"range": full, "error": segment_error(full),
             "length": segment_length(full)}
        ]

        # Greedy splitting of the worst segment.
        while len(segments) < num_segments:
            eligible = [s for s in segments if len(s["range"]) > 2]
            if not eligible:
                break
            worst = eligible[int(np.argmax([s["error"] for s in eligible]))]
            left, right = split_segment(worst["range"])
            i = segments.index(worst)
            segments[i] = left
            segments.insert(i + 1, right)

        # Neighbor-pair smoothing sweeps (reference :1300-1350).
        old_distances: list[int] = []
        for _ in range(10):
            previous = [dict(s) for s in segments]
            for i in range(len(segments) - 1):
                combined = range(
                    segments[i]["range"].start, segments[i + 1]["range"].stop
                )
                if len(combined) < 3:
                    continue
                left, right = split_segment(combined)
                segments[i], segments[i + 1] = left, right
            if all(
                segments[i]["range"] == previous[i]["range"]
                for i in range(len(segments))
            ):
                break
            distance = sum(
                abs(segments[i]["range"].start - previous[i]["range"].start)
                + abs(segments[i]["range"].stop - previous[i]["range"].stop)
                for i in range(len(segments))
            )
            old_distances.append(distance)
            if len(old_distances) > 5 and len(np.unique(old_distances[-5:])) == 1:
                break  # oscillation detected

        node_colors = [sorted_colors[s["range"].start] for s in segments]
        node_colors.append(sorted_colors[segments[-1]["range"].stop - 1])
        # Pad with the last color if splitting stopped early.
        while len(node_colors) < num_segments + 1:
            node_colors.append(node_colors[-1])
        return np.asarray(node_colors)

    def _fit_path_lloyd(
        self,
        spectrum: ColorSpectrum,
        relative_colors: np.ndarray,
        weights: np.ndarray,
        embedding: np.ndarray,
        num_segments: int,
        lloyd_iterations: int,
        name: str,
    ) -> np.ndarray:
        """Quantile-seeded node placement + Lloyd refinement (TPU-friendly
        variant: the projection uses the same vectorized closest-point
        program as ColorPath.fit)."""
        num_dofs = num_segments + 1
        num_points = relative_colors.shape[0]
        order = np.argsort(embedding)
        cumw = np.cumsum(weights[order])
        cumw /= cumw[-1]
        node_colors = np.zeros((num_dofs, 3))
        node_colors[0] = np.zeros(3)  # start at the base color
        for i in range(1, num_dofs):
            q = i / num_segments
            idx = order[min(np.searchsorted(cumw, q), num_points - 1)]
            node_colors[i] = relative_colors[idx]

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
        return node_colors

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
