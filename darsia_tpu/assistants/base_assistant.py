"""Base assistant with matplotlib event loop + headless programmatic mode.

Parity: reference ``assistants/base_assistant.py:13-200``.  Every concrete
assistant here additionally accepts programmatic inputs (``points=...``
etc.) so workflows run headless; the interactive matplotlib path — click
collection with ``d``-undo, ``escape``-reset, ``enter``-finalize and
``q``-quit, background overlays — is used when a display is available.

For tests, the event loop is drivable WITHOUT a display: construct with
``strict=False``, call the assistant (the figure is built, ``plt.show`` is
skipped headless), then inject synthetic ``MouseEvent``/``KeyEvent``
objects through ``fig.canvas.callbacks.process``.
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
        self.fig = kwargs.get("fig")
        self.ax = kwargs.get("ax")
        self.background = kwargs.get("background")
        self.block = kwargs.get("block", True)
        #: With strict=True (default) a blocking call without a display
        #: raises instead of silently returning an empty selection; tests
        #: pass strict=False to drive the figure with synthetic events.
        self.strict = kwargs.get("strict", True)
        self.verbosity = kwargs.get("verbosity", False)
        self.kwargs = kwargs

    @property
    def name(self) -> str:
        return type(self).__name__

    def _print_instructions(self) -> None:
        pass

    def _print_event(self, event) -> None:
        if self.verbosity:
            print(f"{self.name} - event: {event}")

    def _setup_event_handler(self) -> None:
        assert self.fig is not None
        self.fig.canvas.mpl_connect("key_press_event", self._on_key_press)

    def _reset(self) -> None:
        """Clear the selection state (``escape``); subclasses extend."""

    def _finalize(self) -> None:
        """Accept the selection (``enter``): default closes the figure."""
        import matplotlib.pyplot as plt

        plt.close(self.fig)

    def _on_key_press(self, event) -> None:
        """Reference key map (base_assistant.py:76-97): escape resets,
        enter finalizes, q quits."""
        self._print_event(event)
        if event.key == "escape":
            self._reset()
            if self.fig is not None:
                self.fig.canvas.draw_idle()
        elif event.key == "enter":
            self._finalize()
        elif event.key == "q":
            import matplotlib.pyplot as plt

            plt.close(self.fig)

    def __call__(self) -> Any:
        """Open the interactive figure and block until closed.

        Headless (no display): with ``strict=True`` and ``block=True``
        raises (a blocking selection can never complete); otherwise the
        figure is built and returned to the caller for synthetic-event
        driving.
        """
        interactive = interactive_available()
        if not interactive and self.strict and self.block:
            raise RuntimeError(
                f"{self.name} requires an interactive matplotlib backend; "
                "pass programmatic inputs instead when headless."
            )
        self._print_instructions()
        self._plot_2d()
        if interactive:  # pragma: no cover - needs a display
            import matplotlib.pyplot as plt

            plt.show(block=self.block)

    def _plot_2d(self) -> None:
        import matplotlib.pyplot as plt

        if self.fig is None or self.ax is None:
            self.fig, self.ax = plt.subplots()
            self.fig.suptitle(self.name)

        def show(image, alpha=1.0) -> None:
            data = np.asarray(image.img if hasattr(image, "img") else image)
            self.ax.imshow(
                np.clip(data, 0, 1) if data.ndim == 3 else data, alpha=alpha
            )

        # Background overlay semantics of the reference (_plot_2d,
        # base_assistant.py:110-127): boolean backgrounds dim the image,
        # dense backgrounds blend under it.
        if self.background is None:
            show(self.img)
        else:
            bg = np.asarray(
                self.background.img
                if hasattr(self.background, "img")
                else self.background
            )
            if bg.dtype == bool:
                show(self.img, alpha=np.clip(bg.astype(float), 0.5, 1.0))
            else:
                show(self.background, alpha=0.6)
                show(self.img, alpha=0.4)
        self._setup_event_handler()
