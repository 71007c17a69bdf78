"""Persistent XLA compilation cache enablement.

First jit compiles on TPU cost 20-40 s; enabling JAX's persistent
compilation cache makes repeat CLI/workflow runs start hot.  The cache
location honors ``DARSIA_TPU_JAX_CACHE`` (set it to ``0``/``off`` to
disable), defaulting to a per-user directory under the system temp root.
"""

from __future__ import annotations

import logging
import os
import tempfile
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

__all__ = ["enable_persistent_cache"]


def enable_persistent_cache(directory: Optional[str] = None) -> Optional[str]:
    """Point JAX at a persistent compilation cache; returns the path used
    (None when disabled or JAX rejects the setting)."""
    env = os.environ.get("DARSIA_TPU_JAX_CACHE", "")
    if env.lower() in ("0", "off", "false"):
        return None
    uid = getattr(os, "getuid", None)
    suffix = str(uid()) if uid is not None else os.environ.get("USERNAME", "user")
    target = directory or env or str(
        Path(tempfile.gettempdir()) / f"darsia_tpu_jax_cache_{suffix}"
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as exc:  # cache is an optimization, never fatal
        logger.debug("Persistent JAX cache not enabled: %s", exc)
        return None
    return target
