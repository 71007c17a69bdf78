"""Helper workflow steps (parity: reference
``presets/workflows/helper/``; ROI picking/viewing lives in the
headless-capable assistants)."""

from .helper_result_reader import ResultFrame, helper_results, load_result_frames
from .helper_color import color_report, launch_color_helper, helper_color
from .helper_roi import helper_roi, helper_roi_viewer
