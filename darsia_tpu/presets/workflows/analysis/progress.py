"""Progress events for workflow steps (callback-based).

Parity: reference ``presets/workflows/analysis/progress.py:10-118``.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

__all__ = [
    "publish_analysis_progress",
    "publish_step_start",
    "publish_image_progress",
    "publish_step_complete",
]


def _safe_duration(value) -> Optional[float]:
    if value is None:
        return None
    try:
        duration = float(value)
    except (TypeError, ValueError):
        return None
    if not math.isfinite(duration):
        return None
    return max(0.0, duration)


def publish_analysis_progress(progress_callback, payload: dict) -> None:
    if progress_callback is None:
        return
    try:
        progress_callback(payload)
    except Exception:
        pass


def publish_step_start(progress_callback, *, step: str, image_total: int) -> None:
    publish_analysis_progress(
        progress_callback,
        {"event": "step_start", "step": step, "image_total": max(0, image_total)},
    )


def publish_image_progress(
    progress_callback,
    *,
    step: str,
    image_path: str,
    image_index: int,
    image_total: int,
    image_duration_s=None,
) -> None:
    payload = {
        "event": "image_progress",
        "step": step,
        "image_path": str(image_path),
        "image_index": max(0, int(image_index)),
        "image_total": max(0, int(image_total)),
    }
    duration = _safe_duration(image_duration_s)
    if duration is not None:
        payload["image_duration_s"] = duration
    publish_analysis_progress(progress_callback, payload)


def publish_step_complete(
    progress_callback, *, step: str, step_elapsed_s=None
) -> None:
    payload = {"event": "step_complete", "step": step}
    elapsed = _safe_duration(step_elapsed_s)
    if elapsed is not None:
        payload["step_elapsed_s"] = elapsed
    publish_analysis_progress(progress_callback, payload)
