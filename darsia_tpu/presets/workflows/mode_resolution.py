"""Shared resolution of analysis modes to scalar images.

Parity: reference ``presets/workflows/mode_resolution.py:14-170``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

__all__ = [
    "LEGACY_COLOR_TO_MASS_MODES",
    "SCALAR_PRODUCT_MODES",
    "ColorEmbeddingMode",
    "parse_color_mode",
    "validate_mode_syntax",
    "mode_requires_color_to_mass",
    "resolve_mode_image",
]

LEGACY_COLOR_TO_MASS_MODES = {
    "concentration_aq",
    "saturation_g",
    "mass",
    "mass_total",
    "mass_g",
    "mass_aq",
}

SCALAR_PRODUCT_MODES = {
    "rescaled_mass",
    "rescaled_saturation_g",
    "rescaled_concentration_aq",
}


@dataclass(frozen=True)
class ColorEmbeddingMode:
    name: str


def parse_color_mode(mode: str) -> Optional[ColorEmbeddingMode]:
    parts = mode.split(".")
    if len(parts) != 2 or parts[0].lower() != "color":
        return None
    return ColorEmbeddingMode(name=parts[1].strip())


def validate_mode_syntax(
    mode: str, color_embedding_registry=None, key: str = "mode"
) -> None:
    mode = mode.strip()
    if mode in LEGACY_COLOR_TO_MASS_MODES or mode in SCALAR_PRODUCT_MODES:
        return
    if (
        color_embedding_registry is not None
        and mode in color_embedding_registry.embeddings
    ):
        return
    raise ValueError(
        f"Unsupported {key} {mode!r}. Supported: legacy mass modes, rescaled "
        "modes, and color embedding ids from [color.*.*]."
    )


def mode_requires_color_to_mass(mode: str) -> bool:
    return mode.strip() in LEGACY_COLOR_TO_MASS_MODES or mode in SCALAR_PRODUCT_MODES


def _resolve_legacy_mode(mode: str, mass_analysis_result: Any):
    if mass_analysis_result is None:
        raise ValueError(f"Mode {mode!r} requires color-to-mass results.")
    attr = {
        "mass": "mass",
        "mass_total": "mass",
        "mass_g": "mass_g",
        "mass_aq": "mass_aq",
        "concentration_aq": "concentration_aq",
        "saturation_g": "saturation_g",
    }.get(mode)
    if attr is None:
        raise ValueError(f"Unsupported legacy mode {mode!r}.")
    return getattr(mass_analysis_result, attr)


def resolve_mode_image(
    mode: str,
    image,
    mass_analysis_result: Any = None,
    color_embedding_registry=None,
    color_embedding_runtime=None,
    scalar_products: Optional[dict] = None,
):
    mode = mode.strip()
    if scalar_products is not None and mode in scalar_products:
        value = scalar_products[mode]
        if value is not None:
            return value
    if mode in LEGACY_COLOR_TO_MASS_MODES:
        return _resolve_legacy_mode(mode, mass_analysis_result)
    if (
        color_embedding_registry is not None
        and mode in color_embedding_registry.embeddings
    ):
        if color_embedding_runtime is None:
            raise ValueError(
                "Color mode resolution requires a runtime with rig/baseline."
            )
        embedding = color_embedding_registry.resolve(mode)
        return embedding.to_scalar_image(image, color_embedding_runtime)
    raise ValueError(f"Unsupported analysis mode {mode!r}.")
