"""Headless GUI building blocks: step parameter forms, batch monitor,
preview store, dialog text.

Parity: reference ``presets/workflows/user_interface_gui.py`` session
richness (per-step option forms ``:1005-1200``, batch monitor with rolling
ETA ``:455-543,1478-1604``, streamed preview rendering ``:1606-1664``,
done/error dialog composition ``:576-632``) — re-designed as pure,
display-free state objects the Tk layer merely renders, so every behavior
is unit-testable without a display (SURVEY §4 test strategy).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

__all__ = [
    "StepParameter",
    "step_parameters",
    "validate_options",
    "BatchMonitor",
    "PreviewStore",
    "format_duration",
    "workflow_start_message",
    "workflow_done_message",
    "workflow_error_message",
    "completion_dialog",
]


# --------------------------------------------------------------- parameters


@dataclass(frozen=True)
class StepParameter:
    """One form field of a workflow step."""

    name: str
    label: str
    type: str = "bool"  # bool | int | float | str | choice
    default: Any = None
    choices: tuple = ()
    help: str = ""


_COMMON = (
    StepParameter(
        "all_images",
        "Process all images",
        "bool",
        False,
        help="Run over the whole imaging protocol instead of the latest image.",
    ),
)

#: Extra per-step fields beyond the common ones.  Steps not listed take
#: only the common fields.
_STEP_SPECIFIC: dict[str, tuple[StepParameter, ...]] = {
    "analysis: fingers": (
        StepParameter(
            "write_plots",
            "Write overlay PNGs",
            "bool",
            True,
            help="Per-image tips/fjords/skeleton/path overlays.",
        ),
    ),
}


def step_parameters(step: str) -> tuple[StepParameter, ...]:
    """Form fields for one step (common + step-specific)."""
    return _COMMON + _STEP_SPECIFIC.get(step, ())


_COERCE = {
    "bool": lambda v: bool(v) if not isinstance(v, str)
    else v.strip().lower() in ("1", "true", "yes", "on"),
    "int": int,
    "float": float,
    "str": str,
    "choice": str,
}


def validate_options(step: str, options: Optional[dict]) -> dict:
    """Coerce + validate form values; unknown keys are an error.

    Returns a complete option dict (defaults filled in).
    """
    specs = {p.name: p for p in step_parameters(step)}
    options = dict(options or {})
    unknown = set(options) - set(specs)
    if unknown:
        raise KeyError(
            f"Unknown option(s) {sorted(unknown)} for step {step!r}; "
            f"known: {sorted(specs)}"
        )
    out = {}
    for name, spec in specs.items():
        if name in options:
            value = _COERCE[spec.type](options[name])
            if spec.type == "choice" and value not in spec.choices:
                raise ValueError(
                    f"{step!r} option {name!r}: {value!r} not in {spec.choices}"
                )
        else:
            value = spec.default
        out[name] = value
    return out


# ------------------------------------------------------------ batch monitor


def format_duration(seconds: Optional[float]) -> str:
    """HH:MM:SS (or --:--:-- when unknown)."""
    if seconds is None or not (seconds >= 0):
        return "--:--:--"
    s = int(round(seconds))
    return f"{s // 3600:02d}:{(s % 3600) // 60:02d}:{s % 60:02d}"


class BatchMonitor:
    """Progress/ETA state over a stream of typed progress events.

    Feed it the worker's progress events (``step_start`` /
    ``image_progress`` / ``step_complete``); read ``text()`` for the
    dashboard line.  The ETA uses a rolling average of the last
    ``window`` per-image durations (robust against the compile-dominated
    first image).
    """

    def __init__(self, window: int = 5) -> None:
        self.window = window
        self.reset()

    def reset(self, step: str = "", total: int = 0) -> None:
        self.step = step
        self.total = int(total)
        self.processed = 0
        self.durations: list[float] = []
        self.status = "idle"

    def update(self, event: dict) -> None:
        kind = event.get("event")
        if kind == "step_start":
            self.reset(
                step=event.get("step", self.step),
                total=event.get("image_total", 0),
            )
            self.status = "running"
        elif kind == "image_progress":
            self.processed = int(event.get("image_index", self.processed + 1))
            self.total = int(event.get("image_total", self.total))
            duration = event.get("image_duration_s")
            if duration is not None:
                self.durations.append(float(duration))
            self.status = "running"
        elif kind == "step_complete":
            self.status = "done"

    def average_runtime(self) -> Optional[float]:
        if not self.durations:
            return None
        tail = self.durations[-self.window:]
        return sum(tail) / len(tail)

    def remaining(self) -> int:
        return max(self.total - self.processed, 0)

    def percent(self) -> float:
        if self.total <= 0:
            return 0.0
        return min(100.0 * self.processed / self.total, 100.0)

    def eta_seconds(self) -> Optional[float]:
        avg = self.average_runtime()
        if avg is None:
            return None
        return avg * self.remaining()

    def text(self) -> str:
        if self.status == "idle":
            return "idle"
        if self.status == "done":
            return f"{self.step}: done ({self.processed}/{self.total})"
        avg = self.average_runtime()
        avg_txt = f"{avg:.1f} s/img" if avg is not None else "-- s/img"
        return (
            f"{self.step}: {self.processed}/{self.total} "
            f"({self.percent():.0f}%) — {avg_txt} — "
            f"ETA {format_duration(self.eta_seconds())}"
        )


# ------------------------------------------------------------ preview store


class PreviewStore:
    """Latest streamed preview frame per key, with a selection cursor."""

    def __init__(self) -> None:
        self._images: dict[str, Any] = {}
        self._selected: Optional[str] = None

    def update(self, images: Optional[dict]) -> None:
        if not images:
            return
        self._images.update(images)
        if self._selected is None and self._images:
            self._selected = next(iter(self._images))

    def keys(self) -> list[str]:
        return list(self._images)

    def select(self, key: str) -> None:
        if key not in self._images:
            raise KeyError(f"No preview {key!r}; have {self.keys()}")
        self._selected = key

    @property
    def selected(self) -> Optional[str]:
        return self._selected

    def selected_image(self):
        if self._selected is None:
            return None
        return self._images[self._selected]

    def as_display(self, max_size: int = 480):
        """Selected image as a uint8 RGB array bounded to ``max_size``
        (the Tk canvas renders exactly this)."""
        import numpy as np

        img = self.selected_image()
        if img is None:
            return None
        arr = np.asarray(img.img if hasattr(img, "img") else img)
        if arr.ndim == 2:
            arr = arr[..., None].repeat(3, axis=-1)
        if np.issubdtype(arr.dtype, np.floating):
            lo, hi = float(arr.min()), float(arr.max())
            arr = (arr - lo) / (hi - lo) if hi > lo else arr * 0.0
            arr = (255 * arr).astype(np.uint8)
        stride = max(int(np.ceil(max(arr.shape[:2]) / max_size)), 1)
        return np.ascontiguousarray(arr[::stride, ::stride, :3])


# ------------------------------------------------------------- dialog text


def workflow_start_message(step: str, config: str) -> str:
    return f"Running '{step}' with {config} ..."


def workflow_done_message(step: str, elapsed_s: Optional[float]) -> str:
    return f"'{step}' finished in {format_duration(elapsed_s)}."


def workflow_error_message(step: str, error: str) -> str:
    first = error.strip().splitlines()[0] if error.strip() else "unknown error"
    return f"'{step}' failed: {first}"


def completion_dialog(
    step: str,
    failed: bool,
    elapsed_s: Optional[float] = None,
    error: str = "",
    results_folder: Optional[str] = None,
) -> dict:
    """Declarative done/error dialog (title/message/buttons) the Tk layer
    renders verbatim — mirrors the reference's completion_dialog_spec."""
    if failed:
        return {
            "title": "Workflow failed",
            "message": workflow_error_message(step, error),
            "details": error,
            "buttons": ["OK", "Show details"],
        }
    buttons = ["OK"]
    if results_folder:
        buttons.append("Open results folder")
    return {
        "title": "Workflow finished",
        "message": workflow_done_message(step, elapsed_s),
        "results_folder": results_folder,
        "buttons": buttons,
    }
