"""Workflow utilities (parity: reference ``presets/workflows/utils/``)."""

from .images import load_images_with_cache
from .mass import load_data
from .calibration_bundle import (
    export_calibration_bundle,
    import_calibration_bundle,
    preview_calibration_bundle_import_conflicts,
)
from .utils_media import build_media
from .utils_download import DownloadPlan, prepare_download_data, download_data
