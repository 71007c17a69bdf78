"""Color ranges and spectra: membership of colors in calibrated sets.

Parity: reference ``signals/color/{color_range,discrete_color_range,
color_spectrum}.py`` (numba quantization kernels replaced by vectorized
array programs).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = [
    "ColorRange",
    "DiscreteColorRange",
    "ColorSpectrum",
    "color_to_index",
    "index_to_color",
    "flatten_index",
    "unflatten_index",
]


def color_to_index(
    colors: np.ndarray,
    resolution: int,
    min_color=None,
    max_color=None,
) -> np.ndarray:
    """Quantize colors to integer grid indices within a box.

    Default box is [0, 1]^3; pass min/max for e.g. relative colors in
    [-1, 1]^3 (reference discrete_color_range.py quantizes within the
    color range's own box).
    """
    colors = np.asarray(colors, dtype=float)
    lo = np.zeros(3) if min_color is None else np.asarray(min_color, float)
    hi = np.ones(3) if max_color is None else np.asarray(max_color, float)
    span = np.maximum(hi - lo, 1e-12)
    scaled = np.clip((colors - lo) / span, 0.0, 1.0) * (resolution - 1)
    return np.round(scaled).astype(np.int64)


def index_to_color(
    index: np.ndarray,
    resolution: int,
    min_color=None,
    max_color=None,
) -> np.ndarray:
    """Bin-center colors for integer grid indices (inverse of
    :func:`color_to_index`)."""
    lo = np.zeros(3) if min_color is None else np.asarray(min_color, float)
    hi = np.ones(3) if max_color is None else np.asarray(max_color, float)
    return lo + np.asarray(index, dtype=float) / (resolution - 1) * (hi - lo)


def unflatten_index(ids: np.ndarray, resolution: int) -> np.ndarray:
    """Linear ids -> 3d quantization indices (inverse of flatten_index)."""
    ids = np.asarray(ids, dtype=np.int64)
    return np.stack(
        [
            ids // (resolution * resolution),
            (ids // resolution) % resolution,
            ids % resolution,
        ],
        axis=-1,
    )


def flatten_index(index: np.ndarray, resolution: int) -> np.ndarray:
    """Flatten 3d quantization indices to linear ids."""
    index = np.asarray(index)
    return (
        index[..., 0] * resolution * resolution
        + index[..., 1] * resolution
        + index[..., 2]
    )


class ColorRange:
    """Axis-aligned box in color space with membership tests."""

    def __init__(
        self,
        min_color: Optional[np.ndarray] = None,
        max_color: Optional[np.ndarray] = None,
        color_mode=None,
    ) -> None:
        self.min_color = (
            np.zeros(3) if min_color is None else np.asarray(min_color, float).ravel()
        )
        self.max_color = (
            np.ones(3) if max_color is None else np.asarray(max_color, float).ravel()
        )
        if color_mode is None:
            from .color_mode import ColorMode

            color_mode = ColorMode.ABSOLUTE
        self.color_mode = color_mode

    @classmethod
    def from_images(cls, images, baseline=None, mask=None, **kwargs):
        """Bounding color box over a set of (optionally baseline-relative,
        masked) images (reference color_range.py:52-93)."""
        from .color_mode import ColorMode

        min_color = np.full(3, np.inf)
        max_color = np.full(3, -np.inf)
        color_mode = ColorMode.ABSOLUTE
        for image in images:
            array = np.asarray(image.img if hasattr(image, "img") else image)
            if baseline is not None:
                array = array - np.asarray(baseline.img)
                color_mode = ColorMode.RELATIVE
            if mask is not None:
                mask_arr = np.asarray(
                    mask.img if hasattr(mask, "img") else mask, dtype=bool
                )
                array = array[mask_arr]
            flat = array.reshape(-1, 3)
            min_color = np.minimum(min_color, flat.min(axis=0))
            max_color = np.maximum(max_color, flat.max(axis=0))
        return cls(min_color, max_color, color_mode=color_mode)

    def to_dict(self) -> dict:
        """Serializable dict (reference color_range.py:113-124)."""
        return {
            "min_color": self.min_color.tolist(),
            "max_color": self.max_color.tolist(),
            "color_mode": getattr(self.color_mode, "name", str(self.color_mode)),
        }

    @classmethod
    def load_from_dict(cls, data: dict) -> "ColorRange":
        """Inverse of :meth:`to_dict` (reference color_range.py:143-156)."""
        from .color_mode import ColorMode

        return cls(
            np.asarray(data["min_color"]),
            np.asarray(data["max_color"]),
            color_mode=ColorMode[data["color_mode"]]
            if "color_mode" in data
            else None,
        )

    def fit(self, colors: np.ndarray, expand: float = 0.0) -> "ColorRange":
        """Fit the bounding box of a color sample (optionally expanded)."""
        colors = np.asarray(colors, dtype=float).reshape(-1, 3)
        span = colors.max(axis=0) - colors.min(axis=0)
        self.min_color = colors.min(axis=0) - expand * span
        self.max_color = colors.max(axis=0) + expand * span
        return self

    def contains(self, colors: np.ndarray) -> np.ndarray:
        colors = np.asarray(colors, dtype=float)
        return np.all(
            (colors >= self.min_color) & (colors <= self.max_color), axis=-1
        )

    def save(self, path: Path) -> None:
        path = Path(path).with_suffix(".json")
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(
            json.dumps(
                {
                    "min_color": self.min_color.tolist(),
                    "max_color": self.max_color.tolist(),
                }
            )
        )

    @classmethod
    def load(cls, path: Path) -> "ColorRange":
        data = json.loads(Path(path).with_suffix(".json").read_text())
        return cls(np.asarray(data["min_color"]), np.asarray(data["max_color"]))


class DiscreteColorRange(ColorRange):
    """Quantized occupancy grid over color space (discrete membership)."""

    def __init__(self, resolution: int = 51) -> None:
        super().__init__()
        self.resolution = resolution
        self.occupancy: set[int] = set()

    @property
    def shape(self) -> tuple:
        """Shape of the discrete color raster (reference
        discrete_color_range.py:36-39)."""
        return (self.resolution, self.resolution, self.resolution)

    def colors(self, flat: bool = False) -> np.ndarray:
        """All raster node colors as an array (reference
        discrete_color_range.py:103-114): the regular grid spanning
        [min_color, max_color], shape (R,R,R,3) or flat (R^3, 3)."""
        linspaces = [
            np.linspace(self.min_color[i], self.max_color[i], self.resolution)
            for i in range(3)
        ]
        grid = np.meshgrid(*linspaces, indexing="ij")
        colors = np.stack(grid, axis=-1)
        return colors.reshape((-1, 3)) if flat else colors

    def fit(self, colors: np.ndarray, expand: float = 0.0) -> "DiscreteColorRange":
        super().fit(colors, expand)
        ids = flatten_index(
            color_to_index(
                np.asarray(colors).reshape(-1, 3),
                self.resolution,
                self.min_color,
                self.max_color,
            ),
            self.resolution,
        )
        self.occupancy = set(np.unique(ids).tolist())
        return self

    def _in_box(self, colors: np.ndarray) -> np.ndarray:
        # Half-bin slack: box-edge colors still quantize to edge bins.
        slack = 0.5 * (self.max_color - self.min_color) / (self.resolution - 1)
        return np.all(
            (colors >= self.min_color - slack) & (colors <= self.max_color + slack),
            axis=-1,
        )

    def contains(self, colors: np.ndarray) -> np.ndarray:
        colors = np.asarray(colors, dtype=float)
        ids = flatten_index(
            color_to_index(colors, self.resolution, self.min_color, self.max_color),
            self.resolution,
        )
        lookup = np.zeros(self.resolution**3, dtype=bool)
        if self.occupancy:
            lookup[np.fromiter(self.occupancy, dtype=np.int64)] = True
        return lookup[ids] & self._in_box(colors)

    # -- quantization helpers (reference discrete_color_range.py:41-115;
    # the reference accelerates them with numba, here they are vectorized
    # numpy over the module-level converters) --

    def color_to_index(self, color: np.ndarray) -> np.ndarray:
        """Color array (N, 3) -> per-channel raster indices (N, 3)."""
        color = np.asarray(color, dtype=float)
        squeeze = color.ndim == 1
        indices = color_to_index(
            color.reshape(-1, 3), self.resolution, self.min_color, self.max_color
        )
        return indices[0] if squeeze else indices

    def flatten_index(self, index: np.ndarray) -> np.ndarray:
        """Per-channel indices -> flat raster index."""
        index = np.asarray(index)
        squeeze = index.ndim == 1
        flat = flatten_index(index.reshape(-1, 3), self.resolution)
        return flat[0] if squeeze else flat

    def flat_color_index(self, color: np.ndarray) -> np.ndarray:
        """Color array -> flat raster indices (compose the two above)."""
        return self.flatten_index(self.color_to_index(color))

    @classmethod
    def from_images(
        cls, images, baseline=None, mask=None, resolution: int = 51, **kwargs
    ) -> "DiscreteColorRange":
        """Occupancy grid over the colors observed in images
        (ColorRange.from_images + quantized fit)."""
        box = ColorRange.from_images(images, baseline=baseline, mask=mask)
        out = cls(resolution)
        out.color_mode = box.color_mode
        samples = []
        for image in images:
            array = np.asarray(image.img if hasattr(image, "img") else image)
            if baseline is not None:
                array = array - np.asarray(baseline.img)
            if mask is not None:
                mask_arr = np.asarray(
                    mask.img if hasattr(mask, "img") else mask, dtype=bool
                )
                array = array[mask_arr]
            samples.append(array.reshape(-1, 3))
        out.fit(np.concatenate(samples, axis=0))
        return out

    def to_dict(self) -> dict:
        return {
            "min_color": self.min_color.tolist(),
            "max_color": self.max_color.tolist(),
            "color_mode": getattr(self.color_mode, "name", str(self.color_mode)),
            "resolution": self.resolution,
            "occupancy": sorted(self.occupancy),
        }

    @classmethod
    def load_from_dict(cls, data: dict) -> "DiscreteColorRange":
        out = cls(int(data["resolution"]))
        out.min_color = np.asarray(data["min_color"], float)
        out.max_color = np.asarray(data["max_color"], float)
        out.occupancy = set(int(i) for i in data.get("occupancy", []))
        if "color_mode" in data:
            from .color_mode import ColorMode

            out.color_mode = ColorMode[data["color_mode"]]
        return out

    def expand(self, iterations: int = 1) -> "DiscreteColorRange":
        """Morphologically dilate the occupancy in quantized color space."""
        if not self.occupancy:
            return self
        from scipy import ndimage

        grid = np.zeros((self.resolution,) * 3, dtype=bool)
        ids = np.fromiter(self.occupancy, dtype=np.int64)
        grid.reshape(-1)[ids] = True
        grid = ndimage.binary_dilation(grid, iterations=iterations)
        self.occupancy = set(np.nonzero(grid.reshape(-1))[0].tolist())
        return self

    def save(self, path: Path) -> None:
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            resolution=self.resolution,
            occupancy=np.fromiter(self.occupancy, dtype=np.int64)
            if self.occupancy
            else np.zeros(0, dtype=np.int64),
            min_color=self.min_color,
            max_color=self.max_color,
        )

    @classmethod
    def load(cls, path: Path) -> "DiscreteColorRange":
        data = np.load(Path(path).with_suffix(".npz"))
        out = cls(int(data["resolution"]))
        out.occupancy = set(data["occupancy"].tolist())
        out.min_color = data["min_color"]
        out.max_color = data["max_color"]
        return out


class ColorSpectrum(DiscreteColorRange):
    """Observed color spectrum of a region (alias flavor of the discrete
    range with histogram weights)."""

    def __init__(self, resolution: int = 51, base_color=None) -> None:
        super().__init__(resolution)
        self.counts: dict[int, int] = {}
        self.base_color = (
            np.zeros(3) if base_color is None else np.asarray(base_color, float)
        )

    def fit(self, colors: np.ndarray, expand: float = 0.0) -> "ColorSpectrum":
        super().fit(colors, expand)
        ids = flatten_index(
            color_to_index(
                np.asarray(colors).reshape(-1, 3),
                self.resolution,
                self.min_color,
                self.max_color,
            ),
            self.resolution,
        )
        unique, counts = np.unique(ids, return_counts=True)
        self.counts = dict(zip(unique.tolist(), counts.tolist()))
        return self

    def accumulate(self, colors: np.ndarray) -> "ColorSpectrum":
        """Add colors to the histogram without re-fitting the box."""
        ids = flatten_index(
            color_to_index(
                np.asarray(colors).reshape(-1, 3),
                self.resolution,
                self.min_color,
                self.max_color,
            ),
            self.resolution,
        )
        unique, counts = np.unique(ids, return_counts=True)
        for key, value in zip(unique.tolist(), counts.tolist()):
            self.counts[key] = self.counts.get(key, 0) + value
        self.occupancy = set(self.counts.keys())
        return self

    def threshold(self, threshold_significant: float = 0.0) -> "ColorSpectrum":
        """Keep only bins whose probability exceeds the threshold."""
        total = max(sum(self.counts.values()), 1)
        self.counts = {
            k: v for k, v in self.counts.items() if v / total > threshold_significant
        }
        self.occupancy = set(self.counts.keys())
        return self

    def remove(self, other: "DiscreteColorRange") -> "ColorSpectrum":
        """Remove another spectrum's occupied bins (the reference's
        ``ignore`` semantics in get_color_spectrum)."""
        self.counts = {
            k: v for k, v in self.counts.items() if k not in other.occupancy
        }
        self.occupancy = set(self.counts.keys())
        return self

    @property
    def relative_colors(self) -> np.ndarray:
        """Occupied bin-center colors (relative to base_color if the box is
        a relative-color box)."""
        if not self.counts:
            return np.zeros((0, 3))
        ids = np.fromiter(self.counts.keys(), dtype=np.int64, count=len(self.counts))
        return index_to_color(
            unflatten_index(ids, self.resolution),
            self.resolution,
            self.min_color,
            self.max_color,
        )

    @property
    def colors(self) -> np.ndarray:
        return self.base_color + self.relative_colors

    @property
    def probabilities(self) -> np.ndarray:
        if not self.counts:
            return np.zeros(0)
        vals = np.fromiter(
            self.counts.values(), dtype=float, count=len(self.counts)
        )
        return vals / max(vals.sum(), 1.0)

    def distance(self, color: np.ndarray):
        """Minimum Euclidean distance of (relative) colors to the occupied
        spectrum (reference color_spectrum.py:85-103); 0.0 when empty."""
        spectrum = self.relative_colors
        if len(spectrum) == 0:
            return 0.0
        color = np.asarray(color, dtype=float)
        if color.ndim == 1:
            return float(np.min(np.linalg.norm(spectrum - color, axis=1)))
        flat = color.reshape(-1, 3)
        dists = np.min(
            np.linalg.norm(flat[:, None, :] - spectrum[None, :, :], axis=-1),
            axis=1,
        )
        return dists.reshape(color.shape[:-1])

    def in_spectrum(self, colors: np.ndarray, color_mode) -> np.ndarray:
        """Membership of colors in the occupied bins
        (reference color_spectrum.py:165-194); quantized comparison (bin
        resolution) instead of the reference's exact allclose loop."""
        from .color_mode import ColorMode

        colors = np.asarray(colors, dtype=float)
        if color_mode == ColorMode.RELATIVE:
            check = colors
        elif color_mode == ColorMode.ABSOLUTE:
            check = colors - self.base_color
        else:
            raise ValueError(f"Unsupported color mode: {color_mode}")
        return self.contains(check)

    def to_dict(self) -> dict:
        return {
            "resolution": self.resolution,
            "counts": {str(k): v for k, v in self.counts.items()},
            "min_color": self.min_color.tolist(),
            "max_color": self.max_color.tolist(),
            "base_color": self.base_color.tolist(),
        }

    @classmethod
    def from_dict(cls, data: dict) -> "ColorSpectrum":
        out = cls(int(data["resolution"]))
        out.counts = {int(k): int(v) for k, v in data["counts"].items()}
        out.occupancy = set(out.counts.keys())
        out.min_color = np.asarray(data["min_color"])
        out.max_color = np.asarray(data["max_color"])
        out.base_color = np.asarray(data.get("base_color", np.zeros(3)))
        return out

    def save(self, path: Path) -> None:
        path = Path(path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        keys = np.fromiter(self.counts.keys(), dtype=np.int64, count=len(self.counts))
        vals = np.fromiter(self.counts.values(), dtype=np.int64, count=len(self.counts))
        np.savez(
            path,
            resolution=self.resolution,
            keys=keys,
            values=vals,
            min_color=self.min_color,
            max_color=self.max_color,
            base_color=self.base_color,
        )

    @classmethod
    def load(cls, path: Path) -> "ColorSpectrum":
        data = np.load(Path(path).with_suffix(".npz"))
        out = cls(int(data["resolution"]))
        out.counts = dict(
            zip(data["keys"].tolist(), data["values"].tolist())
        )
        out.occupancy = set(out.counts.keys())
        out.min_color = data["min_color"]
        out.max_color = data["max_color"]
        out.base_color = (
            data["base_color"] if "base_color" in data else np.zeros(3)
        )
        return out

    def weight(self, colors: np.ndarray) -> np.ndarray:
        """Relative histogram weight of each color (0 if unseen)."""
        ids = flatten_index(
            color_to_index(
                np.asarray(colors), self.resolution, self.min_color, self.max_color
            ),
            self.resolution,
        )
        total = max(sum(self.counts.values()), 1)
        lookup = np.zeros(self.resolution**3, dtype=float)
        for key, value in self.counts.items():
            lookup[key] = value / total
        return lookup[ids] * self._in_box(np.asarray(colors, dtype=float))
