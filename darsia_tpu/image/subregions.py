"""Quadrilateral ROI extraction (module-level parity alias).

Parity: reference ``src/darsia/image/subregions.py:31`` — the actual
implementation lives with the warp engine
(:mod:`darsia_tpu.corrections.shape.quad`).
"""

from ..corrections.shape.quad import extract_quadrilateral_ROI

__all__ = ["extract_quadrilateral_ROI"]
