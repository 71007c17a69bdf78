"""Corrections: geometric and color image corrections as pure transforms."""

from .base import BaseCorrection, TypeCorrection, read_correction
from .shape.quad import (
    extract_quadrilateral_ROI,
    homography_from_points,
    quad_coordinate_grid,
)
from .shape.curvature import CurvatureCorrection
from .shape.transformation import BaseTransformation, TransformationCorrection
from .shape.affine import AffineTransformation, AffineCorrection
from .shape.rotation import RotationCorrection
from .shape.translation import TranslationEstimator, TranslationCorrection
from .shape.drift import DriftCorrection
from .shape.generalizedperspective import (
    GeneralizedPerspectiveTransformation,
    GeneralizedPerspectiveCorrection,
)

CORRECTION_REGISTRY = {
    "TypeCorrection": TypeCorrection,
    "CurvatureCorrection": CurvatureCorrection,
    "AffineCorrection": AffineCorrection,
    "RotationCorrection": RotationCorrection,
    "TranslationCorrection": TranslationCorrection,
    "DriftCorrection": DriftCorrection,
    "GeneralizedPerspectiveCorrection": GeneralizedPerspectiveCorrection,
}
"""Class-name dispatch for :func:`read_correction`."""
