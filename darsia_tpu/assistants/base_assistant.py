"""Base assistant with matplotlib event loop + headless programmatic mode.

Parity: reference ``assistants/base_assistant.py:13-200``.  Every concrete
assistant here additionally accepts programmatic inputs (``points=...``
etc.) so workflows run headless; the interactive matplotlib path is used
only when a display is available and no inputs were provided.
"""

from __future__ import annotations

from abc import ABC
from typing import Any, Optional

import numpy as np

__all__ = ["BaseAssistant", "interactive_available"]


def interactive_available() -> bool:
    """True when an interactive matplotlib backend can open a window."""
    import os

    import matplotlib

    backend = matplotlib.get_backend().lower()
    if "agg" in backend or "pdf" in backend or "svg" in backend:
        return False
    return bool(os.environ.get("DISPLAY", "")) or "nbagg" in backend


class BaseAssistant(ABC):
    """Matplotlib-event-driven assistant skeleton."""

    def __init__(self, img, **kwargs) -> None:
        self.img = img
        self.fig = None
        self.ax = None
        self.verbosity = kwargs.get("verbosity", False)
        self.kwargs = kwargs

    def _print_instructions(self) -> None:
        pass

    def _print_event(self, event) -> None:
        if self.verbosity:
            print(f"event: {event}")

    def _setup_event_handler(self) -> None:
        assert self.fig is not None
        self.fig.canvas.mpl_connect("key_press_event", self._on_key_press)

    def _on_key_press(self, event) -> None:
        self._print_event(event)
        if event.key == "escape":
            import matplotlib.pyplot as plt

            plt.close(self.fig)

    def __call__(self) -> Any:
        """Open the interactive figure and block until closed."""
        if not interactive_available():
            raise RuntimeError(
                f"{type(self).__name__} requires an interactive matplotlib "
                "backend; pass programmatic inputs instead when headless."
            )
        import matplotlib.pyplot as plt

        self._print_instructions()
        self._plot_2d()
        plt.show(block=True)

    def _plot_2d(self) -> None:
        import matplotlib.pyplot as plt

        self.fig, self.ax = plt.subplots()
        data = np.asarray(self.img.img if hasattr(self.img, "img") else self.img)
        self.ax.imshow(np.clip(data, 0, 1) if data.ndim == 3 else data)
        self._setup_event_handler()
