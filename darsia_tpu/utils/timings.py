"""Timing decorator (parity: reference ``src/darsia/utils/timings.py:8``).

TPU note: wraps host wall time; for device kernels combine with
``jax.block_until_ready`` or :mod:`jax.profiler` traces.
"""

from __future__ import annotations

import functools
import logging
import time

logger = logging.getLogger(__name__)

__all__ = ["timing_decorator"]


def timing_decorator(func):
    """Log the wall time of each call of ``func``."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        tic = time.time()
        result = func(*args, **kwargs)
        logger.info("%s executed in %.4f s.", func.__name__, time.time() - tic)
        return result

    return wrapper
