"""Cross-run event comparison: earliest times mass thresholds are reached.

Parity: reference
``presets/workflows/comparison/comparison_events.py:14-120``.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["comparison_events"]

_MODE_TO_COLUMN = {
    "mass": "detected_mass",
    "mass_g": "detected_mass_g",
    "mass_aq": "detected_mass_aq",
}


def comparison_events(path):
    """For each run + event: earliest time the ROI mass exceeds the
    relative threshold of the total injected mass; write events CSV."""
    import pandas as pd

    from ..config.multi_fluidflower_config import MultiFluidFlowerConfig

    config = MultiFluidFlowerConfig(path, require_results=True)
    assert config.events is not None and config.runs is not None
    events = pd.DataFrame(
        columns=["run"] + list(config.events.events.keys())
    )
    for run, run_config in config.runs.config.items():
        assert run_config.data is not None
        events.at[run, "run"] = run
        mass_path = (
            Path(run_config.analysis.mass.folder)
            / "mass_analysis_results.csv"
        )
        mass_df = pd.read_csv(mass_path)
        for event in config.events.events.values():
            if event.mode not in _MODE_TO_COLUMN:
                raise NotImplementedError(
                    f"Event type {event.mode} not implemented."
                )
            key = f"{event.roi_name}_{_MODE_TO_COLUMN[event.mode]}"
            assert key in mass_df.columns, f"Key {key} not in mass results."
            exact_cols = [c for c in mass_df.columns if "exact_mass" in c]
            total_mass = (
                float(np.max(mass_df[exact_cols[0]])) if exact_cols else 1.0
            )
            reached = mass_df["time"][
                mass_df[key] >= event.relative_threshold * total_mass
            ]
            events.at[run, event.event_id] = (
                float(np.min(reached)) if len(reached) else np.nan
            )
    config.events.path.parent.mkdir(parents=True, exist_ok=True)
    events.to_csv(config.events.path, index=False)
    logger.info("Events written to %s.", config.events.path)
    return events
