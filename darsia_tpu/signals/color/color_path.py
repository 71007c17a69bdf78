"""Piecewise-linear color paths in RGB space.

Parity: reference ``src/darsia/signals/color/color_path.py:19-620``.

TPU deviation: ``fit`` (parametrize all pixels by the closest path point)
is one vectorized/jitted program over stacked segments, replacing the
per-segment Python bookkeeping of the reference.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .color_mode import ColorMode

__all__ = ["ColorPath", "define_color_path"]


class ColorPath:
    """Piecewise linear color path with pixel parametrization."""

    def __init__(
        self,
        colors: Optional[list] = None,
        base_color: Optional[np.ndarray] = None,
        relative_colors: Optional[list] = None,
        mode: Literal["rgb", "lab", "hcl"] = "rgb",
        name: str = "ColorPath",
    ) -> None:
        assert colors is not None or relative_colors is not None
        assert not (colors is not None and relative_colors is not None)
        assert not (relative_colors is not None and base_color is None)

        if colors is not None:
            self.colors = [np.asarray(c, dtype=float) for c in colors]
            self.base_color = (
                np.asarray(base_color, dtype=float)
                if base_color is not None
                else self.colors[0]
            )
            self.relative_colors = [c - self.base_color for c in self.colors]
        else:
            self.relative_colors = [
                np.asarray(c, dtype=float) for c in relative_colors
            ]
            self.base_color = np.asarray(base_color, dtype=float)
            self.colors = [self.base_color + c for c in self.relative_colors]

        self.relative_distances = self._compute_relative_distances()
        self.equidistant_distances = np.linspace(
            0.0, 1.0, len(self.colors)
        ).tolist()
        self.num_segments = len(self.colors) - 1
        self.mode = mode
        self.name = name

    def _compute_relative_distances(self) -> list[float]:
        distances = [
            float(
                np.linalg.norm(
                    self.relative_colors[i] - self.relative_colors[i - 1]
                )
            )
            for i in range(1, len(self.relative_colors))
        ]
        total = sum(distances) if sum(distances) > 0 else 1.0
        return (np.cumsum([0.0] + distances) / total).tolist()

    # ------------------------------------------------------------- sampling

    def sample_absolute_color_path(self, n_colors: int = 256) -> list[np.ndarray]:
        """Sample n_colors along the path (linear in the chosen mode)."""
        params = np.linspace(0.0, 1.0, n_colors)
        sampled = self.interpret(params, ColorMode.ABSOLUTE)
        return [sampled[i] for i in range(n_colors)]

    def get_color_map(self, n_colors: int = 256, name: Optional[str] = None):
        """Matplotlib colormap along the path."""
        from matplotlib.colors import ListedColormap

        sampled = np.clip(
            np.array(self.sample_absolute_color_path(n_colors)), 0, 1
        )
        return ListedColormap(sampled, name=name or self.name)

    def show_cmap(self) -> None:  # pragma: no cover - visual
        import matplotlib.pyplot as plt

        gradient = np.linspace(0, 1, 256)[None].repeat(16, axis=0)
        plt.imshow(gradient, cmap=self.get_color_map(), aspect="auto")
        plt.show()

    def show_path(self, **kwargs) -> None:  # pragma: no cover - visual
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        pts = np.array(self.colors)
        ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], "o-")
        ax.set_xlabel("R"); ax.set_ylabel("G"); ax.set_zlabel("B")
        plt.show()

    # ------------------------------------------------------------------- io

    def to_dict(self) -> dict:
        return {
            "colors": [c.tolist() for c in self.colors],
            "base_color": self.base_color.tolist(),
            "mode": self.mode,
            "name": self.name,
        }

    @classmethod
    def from_dict(cls, data: dict) -> "ColorPath":
        return cls(
            colors=[np.asarray(c) for c in data["colors"]],
            base_color=np.asarray(data["base_color"]),
            mode=data.get("mode", "rgb"),
            name=data.get("name", "ColorPath"),
        )

    def save(self, path: Path) -> None:
        path = Path(path).with_suffix(".json")
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def load(cls, path: Path) -> "ColorPath":
        return cls.from_dict(json.loads(Path(path).read_text()))

    # ------------------------------------------------------------- numerics

    def refine(
        self,
        num_segments: int,
        distance_to_left: Optional[float] = None,
        distance_to_right: Optional[float] = None,
        mode: Literal["relative", "equidistant"] = "relative",
    ) -> "ColorPath":
        """Resample the path into num_segments segments, optionally
        extending beyond its ends.

        Parity: reference ``color_path.py:363-403`` — ``distance_to_left``
        (e.g. -0.1) / ``distance_to_right`` (e.g. 1.1) prepend/append
        extrapolated supports, the spectrum-guided path-extension mechanism
        of the calibration workflows.
        """
        distances = np.linspace(0.0, 1.0, num_segments + 1)
        if distance_to_left is not None:
            distances = np.hstack((distance_to_left, distances))
        if distance_to_right is not None:
            distances = np.hstack((distances, distance_to_right))
        relative_colors = self.interpret(
            distances, color_mode=ColorMode.RELATIVE, mode=mode
        )
        return ColorPath(
            base_color=self.base_color,
            relative_colors=[c for c in relative_colors],
            mode=self.mode,
            name=self.name,
        )

    def _supports_distances(self, color_mode, mode):
        supports = (
            self.colors if color_mode == ColorMode.ABSOLUTE else self.relative_colors
        )
        distances = (
            self.equidistant_distances
            if mode == "equidistant"
            else self.relative_distances
        )
        return np.asarray(supports), np.asarray(distances)

    def fit(
        self,
        colors: np.ndarray,
        color_mode: ColorMode,
        mode: Literal["equidistant", "relative"] = "relative",
    ) -> np.ndarray:
        """Closest-point parametrization of colors along the path.

        Vectorized over all segments in one fused program.
        """
        supports, distances = self._supports_distances(color_mode, mode)
        colors_j = jnp.asarray(colors, dtype=jnp.float32)
        sup = jnp.asarray(supports, dtype=jnp.float32)
        dist = jnp.asarray(distances, dtype=jnp.float32)
        n_seg = self.num_segments

        seg_start = sup[:-1]  # (S, 3)
        seg_vec = sup[1:] - sup[:-1]  # (S, 3)
        seg_len_sq = jnp.maximum(jnp.sum(seg_vec**2, axis=-1), 1e-30)  # (S,)

        # Projection parameter per segment: (..., S)
        diff = colors_j[..., None, :] - seg_start  # (..., S, 3)
        t = jnp.sum(diff * seg_vec, axis=-1) / seg_len_sq
        d0 = dist[:-1]
        d1 = dist[1:]
        interp = d0 + t * (d1 - d0)
        # Segment-wise clipping (open-ended first/last segments).
        lo = jnp.where(jnp.arange(n_seg) == 0, -jnp.inf, d0)
        hi = jnp.where(jnp.arange(n_seg) == n_seg - 1, jnp.inf, d1)
        interp = jnp.clip(interp, lo, hi)

        # Color at the projected parameter, per segment.
        ratio = (interp - d0) / jnp.maximum(d1 - d0, 1e-30)
        proj_color = seg_start + ratio[..., None] * seg_vec  # (..., S, 3)
        l1 = jnp.sum(jnp.abs(colors_j[..., None, :] - proj_color), axis=-1)
        best = jnp.argmin(l1, axis=-1)
        out = jnp.take_along_axis(interp, best[..., None], axis=-1)[..., 0]
        out = jnp.nan_to_num(out, nan=0.0)
        return np.asarray(out)

    def interpret(
        self,
        parameters: np.ndarray,
        color_mode: ColorMode,
        mode: Literal["equidistant", "relative"] = "relative",
    ) -> np.ndarray:
        """Colors along the path at given parameters (inverse of fit)."""
        supports, distances = self._supports_distances(color_mode, mode)
        params = np.asarray(parameters, dtype=float)
        out = np.zeros(params.shape + (3,))
        for segment in range(self.num_segments):
            d0, d1 = distances[segment], distances[segment + 1]
            # First/last segments are open-ended (extrapolation for
            # out-of-range parameters, e.g. refine's path extension).
            lo_ok = (
                params >= d0
                if segment > 0
                else np.ones_like(params, dtype=bool)
            )
            hi_ok = (
                params <= d1
                if segment < self.num_segments - 1
                else np.ones_like(params, dtype=bool)
            )
            mask = lo_ok & hi_ok
            ratio = (params[mask] - d0) / max(d1 - d0, 1e-30)
            out[mask] = supports[segment] + np.outer(
                ratio, supports[segment + 1] - supports[segment]
            ).reshape(-1, 3)
        return out


def define_color_path(
    image, mask, num_colors: int = 5, name: str = "ColorPath"
) -> ColorPath:
    """Derive a color path from masked image pixels (non-interactive).

    Clusters the masked colors and orders cluster centers along their first
    principal direction (replaces the reference's interactive assistant).
    """
    from ...utils.kmeans import kmeans

    data = np.asarray(image.img if hasattr(image, "img") else image)
    mask_arr = np.asarray(mask.img if hasattr(mask, "img") else mask, dtype=bool)
    pixels = data[mask_arr].reshape(-1, data.shape[-1])
    if pixels.shape[0] < num_colors:
        raise ValueError("Not enough masked pixels to define a color path.")
    _, centers = kmeans(pixels, num_colors)
    # Order along the principal component.
    centered = centers - centers.mean(axis=0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    order = np.argsort(centered @ vt[0])
    return ColorPath(colors=[centers[i] for i in order], name=name)
