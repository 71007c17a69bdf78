"""Color mode enum (parity: reference ``signals/color/color_mode.py:6``)."""

from __future__ import annotations

from enum import Enum

__all__ = ["ColorMode"]


class ColorMode(str, Enum):
    """Absolute colors vs colors relative to a baseline."""

    ABSOLUTE = "absolute"
    RELATIVE = "relative"
