"""Data format enumeration (parity: reference ``src/darsia/utils/formats.py:7``)."""

from __future__ import annotations

from enum import Enum

__all__ = ["Format"]


class Format(Enum):
    """Range format of image data."""

    SCALAR = "scalar"
    VECTOR = "vector"
    TENSOR = "tensor"
