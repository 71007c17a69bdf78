"""Cropping workflow step: export corrected (cropped) images.

Parity: reference
``presets/workflows/analysis/analysis_cropping.py:34-160``.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from .analysis_context import AnalysisContext, prepare_analysis_context, iter_prefetched_images
from .progress import publish_image_progress, publish_step_complete, publish_step_start
from .streaming import publish_stream_images

logger = logging.getLogger(__name__)

__all__ = ["analysis_cropping_from_context", "analysis_cropping"]


def analysis_cropping_from_context(
    ctx: AnalysisContext,
    show: bool = False,
    stream_callback: Optional[Callable] = None,
    progress_callback: Optional[Callable] = None,
) -> None:
    config = ctx.config
    assert config.analysis is not None and config.data is not None
    formats = (
        config.analysis.cropping.formats
        if config.analysis.cropping is not None
        else ["jpg"]
    )
    out = Path(config.data.results) / "cropped"
    out.mkdir(parents=True, exist_ok=True)

    publish_step_start(
        progress_callback, step="cropping", image_total=len(ctx.image_paths)
    )
    started = time.monotonic()
    for index, path, img in iter_prefetched_images(ctx):
        t0 = time.monotonic()
        if img is None:
            continue
        if "jpg" in formats:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.imsave(
                out / f"{path.stem}.jpg",
                np.clip(np.asarray(img.img), 0, 1),
            )
        if "npz" in formats:
            img.save(out / f"{path.stem}.npz")
        publish_stream_images(
            stream_callback, {"cropped": img}, logger=logger
        )
        publish_image_progress(
            progress_callback,
            step="cropping",
            image_path=str(path),
            image_index=index,
            image_total=len(ctx.image_paths),
            image_duration_s=time.monotonic() - t0,
        )
    publish_step_complete(
        progress_callback,
        step="cropping",
        step_elapsed_s=time.monotonic() - started,
    )


def analysis_cropping(path, cls=None, all: bool = False, **kwargs) -> None:
    from ..rig import Rig

    ctx = prepare_analysis_context(cls=cls or Rig, path=path, all=all)
    analysis_cropping_from_context(ctx, **kwargs)
