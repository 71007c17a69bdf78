"""Legacy calibration entry points (pre-[calibration.*] config schema).

Parity: reference ``presets/workflows/calibration/{calibration_color_analysis,
calibration_color_signal,calibration_flash,calibration_mass_analysis}.py``
— those reference an older config layout (top-level [color_paths],
[color_signal], [mass]); here they forward onto the current steps and
explain the migration when the legacy sections are encountered.
"""

from __future__ import annotations

import logging
from warnings import warn

from .calibration_color_paths import calibration_color_paths
from .calibration_color_to_mass_analysis import calibration_color_to_mass_analysis

logger = logging.getLogger(__name__)

__all__ = [
    "calibration_color_analysis",
    "calibration_color_signal",
    "calibration_flash",
    "calibration_mass_analysis",
]

_MIGRATION = (
    "uses the legacy config schema; move the settings into "
    "[calibration.color] / [calibration.mass] (see templates/config.toml)."
)


def calibration_color_analysis(cls=None, path=None, show: bool = False):
    """Legacy alias of the color-path calibration."""
    warn(f"calibration_color_analysis {_MIGRATION}", DeprecationWarning)
    if path is None:
        path, cls = cls, None
    return calibration_color_paths(path, cls=cls, show=show)


def calibration_color_signal(cls=None, path=None, show: bool = False):
    """Legacy alias: the signal functions are calibrated within the
    color-to-mass step."""
    warn(f"calibration_color_signal {_MIGRATION}", DeprecationWarning)
    if path is None:
        path, cls = cls, None
    return calibration_color_to_mass_analysis(path, cls=cls)


def calibration_flash(cls=None, path=None, show: bool = False):
    """Legacy alias: flash bounds are calibrated within the color-to-mass
    step."""
    warn(f"calibration_flash {_MIGRATION}", DeprecationWarning)
    if path is None:
        path, cls = cls, None
    return calibration_color_to_mass_analysis(path, cls=cls)


def calibration_mass_analysis(cls=None, path=None, show: bool = False):
    """Legacy alias of the color-to-mass calibration."""
    warn(f"calibration_mass_analysis {_MIGRATION}", DeprecationWarning)
    if path is None:
        path, cls = cls, None
    return calibration_color_to_mass_analysis(path, cls=cls)
