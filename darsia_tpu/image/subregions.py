"""Quadrilateral ROI extraction (module-level parity alias).

Parity: reference ``src/darsia/image/subregions.py:31`` — the actual
implementation lives with the warp engine
(:mod:`darsia_tpu.corrections.shape.quad`).
"""

from typing import Literal

from ..corrections.shape.quad import extract_quadrilateral_ROI

__all__ = ["InterpolationOption", "extract_quadrilateral_ROI"]

# Parity: reference image/subregions.py:27.
InterpolationOption = Literal["inter_nearest", "inter_linear", "inter_area"]
