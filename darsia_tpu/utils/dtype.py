"""Dtype conversion utilities with value-range rescaling.

TPU note: the framework standardises device compute on float32 (bfloat16 in
hot kernels); integer image types exist only at the I/O boundary.  Parity
with reference ``src/darsia/utils/dtype.py:9``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["convert_dtype"]

_RANGES = {
    np.dtype(np.uint8): 255.0,
    np.dtype(np.uint16): 65535.0,
}


def convert_dtype(img, dtype) -> np.ndarray:
    """Convert an array between image dtypes, rescaling the value range.

    float <-> uint8/uint16 conversions map [0, 1] <-> [0, max_int]; float to
    float and int to int conversions rescale accordingly.

    Args:
        img: input array (numpy or jax; returned as the same family).
        dtype: target dtype.

    Returns:
        converted array.

    """
    dtype = np.dtype(dtype)
    src = np.dtype(img.dtype)
    if src == dtype:
        return img

    src_range = _RANGES.get(src)
    dst_range = _RANGES.get(dtype)

    # Work in float for intermediate scaling.
    out = img.astype(np.float64 if isinstance(img, np.ndarray) else np.float32)
    if src_range is not None:
        out = out / src_range
    if dst_range is not None:
        out = (out * dst_range).round().clip(0, dst_range)
    return out.astype(dtype)
