"""Corrections: geometric and color image corrections as pure transforms."""

from .base import BaseCorrection, TypeCorrection, read_correction
from .fuse import FusedCorrectionChain, apply_transformation_chain
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

from .color.colorbalance import (
    BaseBalance,
    ColorBalance,
    WhiteBalance,
    AffineBalance,
    AdaptiveBalance,
    color_balance,
    white_balance,
    affine_balance,
)
from .color.colorcorrection import (
    ColorChecker,
    ColorCheckerAfter2014,
    CustomColorChecker,
    ColorCorrection,
)
from .color.illuminationcorrection import IlluminationCorrection
from .color.patchwiseilluminationcorrection import PatchwiseIlluminationCorrection
from .color.dynamicilluminationcorrection import DynamicIlluminationCorrection
from .color.relativecolorcorrection import RelativeColorCorrection
from .color.experimentalcolorcorrection import EOTF, ExperimentalColorCorrection

CORRECTION_REGISTRY = {
    "ColorCorrection": ColorCorrection,
    "IlluminationCorrection": IlluminationCorrection,
    "PatchwiseIlluminationCorrection": PatchwiseIlluminationCorrection,
    "DynamicIlluminationCorrection": DynamicIlluminationCorrection,
    "RelativeColorCorrection": RelativeColorCorrection,
    "ExperimentalColorCorrection": ExperimentalColorCorrection,
    "TypeCorrection": TypeCorrection,
    "CurvatureCorrection": CurvatureCorrection,
    "AffineCorrection": AffineCorrection,
    "RotationCorrection": RotationCorrection,
    "TranslationCorrection": TranslationCorrection,
    "DriftCorrection": DriftCorrection,
    "GeneralizedPerspectiveCorrection": GeneralizedPerspectiveCorrection,
}


def _register_resize() -> None:
    # Resize lives in restoration but participates in correction pipelines
    # (reference corrections/readcorrection.py handles it the same way);
    # late import avoids a circular dependency.
    from ..restoration.resize import Resize

    CORRECTION_REGISTRY["Resize"] = Resize


_register_resize()
"""Class-name dispatch for :func:`read_correction`."""


def _any_correction_union():
    from ..restoration.resize import Resize

    return (
        TypeCorrection
        | DriftCorrection
        | CurvatureCorrection
        | IlluminationCorrection
        | PatchwiseIlluminationCorrection
        | ColorCorrection
        | Resize
    )


AnyCorrection = _any_correction_union()
"""Union of corrections accepted in transformation chains
(parity: reference corrections/readcorrection.py:17-25)."""
