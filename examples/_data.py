"""Shared example-data loader.

Uses the DarSIA example images when available (set DARSIA_TPU_IMAGES to a
folder containing baseline.jpg / co2_*.jpg), otherwise synthesizes a small
rig-like dataset so every example runs standalone.
"""

from __future__ import annotations

import sys
from pathlib import Path as _P

# Allow running examples from a checkout without installation.
_repo_root = str(_P(__file__).resolve().parents[1])
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)


import os
from pathlib import Path

import numpy as np

import darsia_tpu as da

_CANDIDATES = [
    os.environ.get("DARSIA_TPU_IMAGES", ""),
    "/root/reference/examples/images",
    str(Path(__file__).parent / "images"),
]


def images_folder():
    for candidate in _CANDIDATES:
        if candidate and (Path(candidate) / "baseline.jpg").exists():
            return Path(candidate)
    return None


def load_baseline(shape=(270, 512)):
    folder = images_folder()
    if folder is not None:
        img = da.imread(folder / "baseline.jpg", width=2.8, height=1.5)
        img = da.Resize(shape=shape)(img)
        out = img.copy()
        out.img = np.asarray(img.img, np.float32) / 255.0
        return out
    rng = np.random.default_rng(0)
    data = rng.uniform(0.35, 0.6, size=shape + (3,)).astype(np.float32)
    return da.Image(data, width=2.8, height=1.5, color_space="RGB")


def load_co2_series(shape=(270, 512)):
    folder = images_folder()
    if folder is not None:
        out = []
        for i in range(3):
            img = da.Resize(shape=shape)(
                da.imread(folder / f"co2_{i}.jpg", width=2.8, height=1.5)
            )
            scaled = img.copy()
            scaled.img = np.asarray(img.img, np.float32) / 255.0
            out.append(scaled)
        return out
    base = np.asarray(load_baseline(shape).img)
    out = []
    for i, growth in enumerate((30, 60, 90)):
        arr = base.copy()
        arr[40:40 + growth, 60:60 + 2 * growth] += [0.25, -0.08, -0.08]
        img = da.Image(
            np.clip(arr, 0, 1), width=2.8, height=1.5, color_space="RGB"
        )
        img.time = 3600.0 * (i + 1)
        out.append(img)
    return out


def fast_mode() -> bool:
    """True when examples should downscale work (integration-suite runs).

    Set DARSIA_TPU_FAST=1 to cut resolutions/refinement levels so the
    whole examples suite finishes in minutes on a cold XLA cache; the
    default (unset) runs each example at its reference-mirroring scale.
    """
    return os.environ.get("DARSIA_TPU_FAST", "") not in ("", "0")
