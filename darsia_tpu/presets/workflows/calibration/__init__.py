"""Calibration workflow steps (parity: reference
``presets/workflows/calibration/``)."""

from .metadata import (
    write_calibration_metadata,
    read_calibration_metadata,
    validate_basis_metadata,
)
from .calibration_color_paths import (
    calibration_color_paths_from_context,
    calibration_color_paths,
    collect_existing_calibration_paths_to_delete,
    delete_calibration,
)
from .calibration_color_to_mass_analysis import (
    calibration_color_to_mass_analysis_from_context,
    calibration_color_to_mass_analysis,
)
from .legacy import (
    calibration_color_analysis,
    calibration_color_signal,
    calibration_flash,
    calibration_mass_analysis,
)
