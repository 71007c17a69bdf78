"""Helper workflow steps (parity: reference
``presets/workflows/helper/``; ROI picking/viewing lives in the
headless-capable assistants)."""

from .helper_result_reader import helper_results
