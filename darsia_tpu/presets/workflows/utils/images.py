"""Corrected-image loading with npz cache.

Parity: reference ``presets/workflows/utils/images.py:13-60``.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

from ....image.imread import imread

logger = logging.getLogger(__name__)

__all__ = ["load_images_with_cache"]


def load_images_with_cache(
    rig, paths: list, use_cache: bool = False, cache_dir: Optional[Path] = None
) -> list:
    """Read + correct images, caching corrected results as npz."""
    images = []
    for path in paths:
        path = Path(path)
        if use_cache and cache_dir is not None:
            cache_path = Path(cache_dir) / path.with_suffix(".npz").name
            if cache_path.exists():
                images.append(imread(cache_path))
                continue
            image = rig.read_image(path)
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            image.save(cache_path)
            images.append(image)
        else:
            images.append(rig.read_image(path))
    return images
