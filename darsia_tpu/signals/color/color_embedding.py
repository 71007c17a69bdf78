"""Color embeddings: registry-driven 3D color -> 1D signal transforms.

Parity: reference ``signals/color/color_embedding*.py`` (channel / path /
range embeddings, basis handling).  The Rig coupling is kept through the
``ColorEmbeddingRuntime`` carrier.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...image.image import Image, OpticalImage, ScalarImage
from ...ops.color import convert_trichromatic
from .color_mode import ColorMode
from .label_maps import LabelColorPathMap

__all__ = [
    "ColorEmbeddingBasis",
    "parse_color_embedding_basis",
    "calibration_basis_folder",
    "ColorEmbeddingRuntime",
    "ColorEmbeddingTransform",
    "ColorEmbedding",
    "ColorChannelEmbedding",
    "ColorChannelEmbeddingTransform",
    "ColorPathEmbedding",
    "ColorPathEmbeddingTransform",
    "ColorRangeEmbedding",
    "ColorRangeEmbeddingTransform",
    "to_scalar_image",
    "channel_index",
    "normalized_trichromatic",
]


class ColorEmbeddingBasis(str, Enum):
    """Label space used by color embedding workflows."""

    LABELS = "labels"
    FACIES = "facies"
    GLOBAL = "global"


def parse_color_embedding_basis(
    value, default: ColorEmbeddingBasis = ColorEmbeddingBasis.FACIES
) -> ColorEmbeddingBasis:
    if value is None:
        return default
    if isinstance(value, ColorEmbeddingBasis):
        return value
    return ColorEmbeddingBasis(str(value).lower().strip())


def calibration_basis_folder(basis) -> str:
    return f"from_{parse_color_embedding_basis(basis).value}"


@dataclass
class ColorEmbeddingRuntime:
    """Runtime context (rig + transform cache)."""

    rig: object
    cache: dict = field(default_factory=dict)


class ColorEmbeddingTransform(ABC):
    """Canonical transform: 3d color image -> scalar image."""

    @abstractmethod
    def __call__(self, image: Image) -> ScalarImage:
        ...


class ColorEmbedding(ABC):
    """Abstract embedding descriptor."""

    embedding_id: str
    mode: ColorMode
    basis: ColorEmbeddingBasis

    @abstractmethod
    def canonical_transform(
        self, runtime: ColorEmbeddingRuntime
    ) -> ColorEmbeddingTransform:
        ...

    def to_scalar_image(self, image: Image, runtime: ColorEmbeddingRuntime):
        if self.embedding_id not in runtime.cache:
            runtime.cache[self.embedding_id] = self.canonical_transform(runtime)
        return runtime.cache[self.embedding_id](image)

    def get_labels(self, runtime):
        rig = runtime.rig if isinstance(runtime, ColorEmbeddingRuntime) else runtime
        if self.basis == ColorEmbeddingBasis.GLOBAL:
            import numpy as np

            base = rig.baseline
            return ScalarImage(
                np.zeros(base.num_voxels[:2], dtype=int), **{
                    k: v for k, v in base.metadata().items() if k != "scalar"
                }
            )
        if self.basis == ColorEmbeddingBasis.FACIES:
            return rig.facies
        if self.basis == ColorEmbeddingBasis.LABELS:
            return rig.labels
        raise ValueError(f"Unsupported color embedding basis {self.basis}.")


def to_scalar_image(template: Image, values) -> ScalarImage:
    metadata = template.metadata()
    metadata.pop("color_space", None)
    return ScalarImage(img=values, **metadata)


def channel_index(color_space: str, channel: str) -> int:
    channel_map = {
        "RGB": {"r": 0, "g": 1, "b": 2},
        "BGR": {"b": 0, "g": 1, "r": 2},
        "HSV": {"h": 0, "s": 1, "v": 2},
        "HLS": {"h": 0, "l": 1, "s": 2},
        "LAB": {"l": 0, "a": 1, "b": 2},
    }
    mapping = channel_map.get(color_space.upper(), {})
    if channel not in mapping:
        raise ValueError(
            f"Unsupported channel {channel!r} for color space {color_space!r}."
        )
    return mapping[channel]


def normalized_trichromatic(
    image: Image,
    color_space: str,
    mode: ColorMode,
    baseline: Optional[Image] = None,
):
    """Trichromatic data in the target color space (optionally baseline-
    relative)."""
    data = jnp.asarray(image.img, dtype=jnp.float32)
    if float(data.max()) > 1.5:
        data = data / 255.0
    cs = color_space.upper().strip()
    if mode == ColorMode.RELATIVE:
        if baseline is None:
            raise ValueError("Relative color embedding requires baseline image.")
        base = jnp.asarray(baseline.img, dtype=jnp.float32)
        if float(base.max()) > 1.5:
            base = base / 255.0
        data = jnp.clip(data - base, -1.0, 1.0)
        if cs not in ("RGB", "BGR"):
            raise ValueError(
                "Relative mode only supported in RGB/BGR color spaces."
            )
        converted = data if cs == "RGB" else data[..., ::-1]
    else:
        converted = convert_trichromatic(data, "RGB", cs)
    return np.asarray(converted), cs


@dataclass
class ColorChannelEmbeddingTransform(ColorEmbeddingTransform):
    color_space: str
    channel: str
    mode: ColorMode
    baseline: Optional[Image] = None

    def __call__(self, image: Image) -> ScalarImage:
        trichromatic, cs = normalized_trichromatic(
            image, self.color_space, self.mode, self.baseline
        )
        idx = channel_index(cs, self.channel)
        return to_scalar_image(image, trichromatic[..., idx])


@dataclass
class ColorChannelEmbedding(ColorEmbedding):
    embedding_id: str
    mode: ColorMode
    basis: ColorEmbeddingBasis
    color_space: str = "RGB"
    channel: str = "r"
    calibration_root: Optional[Path] = None
    mask_embedding: object = None

    @property
    def config_file(self) -> Path:
        """Embedding config location (reference
        color_embedding_channel.py:76-77)."""
        return Path(self.calibration_root) / "embedding.json"

    def canonical_transform(self, runtime) -> ColorEmbeddingTransform:
        return ColorChannelEmbeddingTransform(
            color_space=self.color_space,
            channel=self.channel,
            mode=self.mode,
            baseline=runtime.rig.baseline if self.mode == ColorMode.RELATIVE else None,
        )


@dataclass
class ColorPathEmbeddingTransform(ColorEmbeddingTransform):
    analysis: object  # ConcentrationAnalysis-like

    def __call__(self, image: Image) -> ScalarImage:
        return self.analysis(image)


@dataclass
class ColorPathEmbedding(ColorEmbedding):
    """Per-label color-path parametrization embedding."""

    embedding_id: str
    mode: ColorMode
    basis: ColorEmbeddingBasis
    calibration_root: Path
    num_segments: int = 1
    ignore_labels: list = field(default_factory=list)
    resolution: int = 51
    reference_label: int = 0
    threshold_baseline: float = 0.0
    threshold_calibration: float = 0.0
    rois: list = field(default_factory=list)
    ignore_baseline_spectrum: str = "expanded"
    histogram_weighting: str = "threshold"
    calibration_mode: str = "auto"
    baseline_data: object = None
    data: object = None

    @property
    def color_paths_folder(self) -> Path:
        return (
            Path(self.calibration_root)
            / "color_paths"
            / calibration_basis_folder(self.basis)
        )

    @property
    def baseline_color_spectrum_folder(self) -> Path:
        """Baseline spectrum cache location (reference
        color_embedding_path.py:56-57)."""
        return Path(self.calibration_root) / "baseline_color_spectrum"

    @property
    def color_range_file(self) -> Path:
        """Calibrated color-range location (reference
        color_embedding_path.py:60-61)."""
        return Path(self.calibration_root) / "color_range"

    @property
    def color_to_mass_folder(self) -> Path:
        return (
            Path(self.calibration_root)
            / "color_to_mass"
            / calibration_basis_folder(self.basis)
        )

    def canonical_transform(self, runtime) -> ColorEmbeddingTransform:
        from ..models.color_path_interpolation import LabelColorPathInterpolation

        labels = self.get_labels(runtime)
        color_paths = LabelColorPathMap.load(self.color_paths_folder)
        model = LabelColorPathInterpolation(
            color_paths=color_paths,
            labels=np.asarray(labels.img),
            color_mode=self.mode,
        )
        baseline = (
            runtime.rig.baseline if self.mode == ColorMode.RELATIVE else None
        )

        class _Transform(ColorEmbeddingTransform):
            def __call__(self, image: Image) -> ScalarImage:
                data = jnp.asarray(image.img, dtype=jnp.float32)
                if float(data.max()) > 1.5:
                    data = data / 255.0
                if baseline is not None:
                    base = jnp.asarray(baseline.img, dtype=jnp.float32)
                    if float(base.max()) > 1.5:
                        base = base / 255.0
                    data = data - base
                return to_scalar_image(image, model.call_array(data))

        return _Transform()


@dataclass
class ColorRangeEmbeddingTransform(ColorEmbeddingTransform):
    color_space: str
    ranges: list
    mode: ColorMode
    baseline: Optional[Image] = None
    restoration: object = None

    def __call__(self, image: Image) -> ScalarImage:
        trichromatic, cs = normalized_trichromatic(
            image, self.color_space, self.mode, self.baseline
        )
        mask = np.ones(trichromatic.shape[:2], dtype=bool)
        for channel, (lower, upper) in enumerate(self.ranges):
            values = trichromatic[..., channel]
            if lower is None and upper is None:
                continue
            if lower is None:
                component = values <= float(upper)
            elif upper is None:
                component = values >= float(lower)
            elif channel == 0 and cs in ("HSV", "HLS") and float(lower) > float(upper):
                component = (values >= float(lower)) | (values <= float(upper))
            else:
                component = (values >= float(lower)) & (values <= float(upper))
            mask &= component
        scalar = to_scalar_image(image, mask.astype(np.float32))
        if self.restoration is not None:
            scalar = self.restoration(scalar)
        return scalar


@dataclass
class ColorRangeEmbedding(ColorEmbedding):
    embedding_id: str
    mode: ColorMode
    basis: ColorEmbeddingBasis
    calibration_root: Path
    color_space: str = "HSV"
    ranges: list = field(default_factory=list)
    restoration_config: object = None

    @property
    def config_file(self) -> Path:
        """Embedding config location (reference
        color_embedding_range.py:85-86)."""
        return Path(self.calibration_root) / "embedding.json"

    def canonical_transform(self, runtime) -> ColorEmbeddingTransform:
        if self.basis != ColorEmbeddingBasis.GLOBAL:
            raise NotImplementedError(
                "Color range embedding currently only supports basis='global'."
            )
        return ColorRangeEmbeddingTransform(
            color_space=self.color_space,
            ranges=self.ranges,
            mode=self.mode,
            baseline=runtime.rig.baseline,
        )
