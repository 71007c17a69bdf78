"""Result reader: re-export saved analysis fields in other formats.

Parity: reference ``presets/workflows/helper/helper_result_reader.py``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path
from types import SimpleNamespace

import numpy as np

from ....image.imread import imread
from ..analysis.analysis_context import prepare_analysis_context
from ..mode_resolution import SCALAR_PRODUCT_MODES

logger = logging.getLogger(__name__)

__all__ = [
    "ResultFrame",
    "helper_results",
    "load_result_frames",
    "launch_result_reader",
    "helper_result_reader",
]


@dataclass
class ResultFrame:
    """One loaded result field with its provenance and summary statistics
    (reference ``helper/helper_result_reader.py:24-30``)."""

    image: object
    source_name: str
    result_path: Path
    minimum: float
    maximum: float
    integral: float


def load_result_frames(files) -> list:
    """Load exported npz result fields into :class:`ResultFrame` records
    (min/max plus the plain-sum integral the viewer displays)."""
    frames = []
    for file in files:
        file = Path(file)
        image = imread(file)
        arr = np.asarray(image.img, dtype=float)
        frames.append(
            ResultFrame(
                image=image,
                source_name=file.stem,
                result_path=file,
                minimum=float(arr.min()) if arr.size else 0.0,
                maximum=float(arr.max()) if arr.size else 0.0,
                integral=float(arr.sum()),
            )
        )
    return frames


def _result_npz_files(config) -> list:
    """Resolve the [helper.results] source folder and list its npz files
    (mode -> mass-subfolder mapping + plain-mode fallback, shared by
    :func:`helper_results` and :func:`helper_result_reader`)."""
    results_config = config.helper.results
    mode = results_config.mode
    folder_mode = (
        "mass" if mode in SCALAR_PRODUCT_MODES or "mass" in mode else mode
    )
    source = Path(config.analysis.mass.folder) / folder_mode / "npz"
    if not source.exists():
        source = Path(config.analysis.mass.folder) / mode / "npz"
    return sorted(source.glob("*.npz")) if source.exists() else []


def launch_result_reader(
    frames: list, *, mode: str, cmap=None
) -> None:  # pragma: no cover - interactive
    """Interactive frame stepper over loaded result fields with per-frame
    min/max/integral readout (reference helper_result_reader.py:107-172;
    requires a display)."""
    import matplotlib.pyplot as plt
    from matplotlib.widgets import Button

    if len(frames) == 0:
        raise ValueError("ResultViewer received no result frames.")

    fig, ax = plt.subplots(figsize=(11, 8))
    plt.subplots_adjust(bottom=0.16)
    state = {"idx": 0, "colorbar": None}

    def _render() -> None:
        ax.cla()
        frame = frames[state["idx"]]
        arr = np.asarray(frame.image.img)
        if arr.ndim == 3 and arr.shape[2] == 1:
            arr = arr[..., 0]
        handle = ax.imshow(arr, cmap=cmap or "viridis")
        if state["colorbar"] is None:
            state["colorbar"] = fig.colorbar(handle, ax=ax)
        else:
            state["colorbar"].update_normal(handle)
        ax.set_title(
            f"[{mode}] {frame.source_name} "
            f"({state['idx'] + 1}/{len(frames)}) — "
            f"min {frame.minimum:.3g}, max {frame.maximum:.3g}, "
            f"integral {frame.integral:.3g}"
        )
        fig.canvas.draw_idle()

    def _step(delta: int):
        def _go(_event) -> None:
            state["idx"] = (state["idx"] + delta) % len(frames)
            _render()

        return _go

    prev_btn = Button(fig.add_axes([0.3, 0.04, 0.1, 0.06]), "Prev")
    next_btn = Button(fig.add_axes([0.6, 0.04, 0.1, 0.06]), "Next")
    prev_btn.on_clicked(_step(-1))
    next_btn.on_clicked(_step(1))
    _render()
    plt.show()


def helper_result_reader(cls, path, show: bool = False) -> list:
    """Load exported result fields per [helper.results] into
    :class:`ResultFrame` records; with ``show`` the interactive viewer
    opens (reference helper_result_reader.py:174-240).  Returns the
    frames (the reference returns None and always opens its viewer)."""
    from ..analysis.analysis_context import prepare_analysis_context
    from ..rig import Rig

    ctx = prepare_analysis_context(cls=cls or Rig, path=path, section="helper")
    config = ctx.config
    assert config.helper is not None and config.helper.results is not None
    results_config = config.helper.results
    frames = load_result_frames(_result_npz_files(config))
    if show:  # pragma: no cover - interactive
        launch_result_reader(
            frames,
            mode=results_config.mode,
            cmap=getattr(results_config, "cmap", None),
        )
    return frames


def helper_results(path, cls=None, show: bool = False) -> list:
    """Load exported mass fields per [helper.results] and re-export."""
    from ..rig import Rig

    ctx = prepare_analysis_context(
        cls=cls or Rig, path=path, section="helper"
    )
    config = ctx.config
    assert config.helper is not None and config.helper.results is not None
    results_config = config.helper.results
    mode = results_config.mode
    files = _result_npz_files(config)
    out_dir = Path(config.data.results) / "helper" / mode
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for file in files:
        image = imread(file)
        if results_config.format == "npz":
            target = out_dir / file.name
            image.save(target)
        elif results_config.format in ("jpg", "png"):
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            target = out_dir / f"{file.stem}.{results_config.format}"
            plt.imsave(
                target,
                np.asarray(image.img),
                cmap=results_config.cmap or "viridis",
            )
        elif results_config.format == "csv":
            target = out_dir / f"{file.stem}.csv"
            np.savetxt(target, np.asarray(image.img), delimiter=",")
        else:
            raise ValueError(f"Unsupported format {results_config.format!r}.")
        written.append(target)
    logger.info("Re-exported %d result files to %s.", len(written), out_dir)
    return written
