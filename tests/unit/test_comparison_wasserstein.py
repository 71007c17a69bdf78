"""Comparison workflow: batched cross-run W1 sweep (reference
presets/workflows/comparison/comparison_wasserstein.py:109-658)."""

import json
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pytest

import darsia_tpu as da
import importlib

# The package re-exports the entry function under the module's name, so
# resolve the module itself via importlib.
cw = importlib.import_module(
    "darsia_tpu.presets.workflows.comparison.comparison_wasserstein"
)


def _mass_image(seed, n=10):
    rng = np.random.default_rng(seed)
    arr = np.zeros((n, n))
    arr[2:5, 2:5] = 1.0
    arr += 0.05 * rng.random((n, n))
    arr /= arr.sum() * 0.01  # unit physical mass on the 1x1 domain
    return da.Image(arr, width=1.0, height=1.0, scalar=True)


@dataclass
class _WConfig:
    results: Path = None
    runs: list = field(default_factory=lambda: ["run_a", "run_b", "run_c"])
    resize_factor: float = None
    relative_tol: float = 0.5
    times: list = field(default_factory=lambda: [(1.0, 0.1), (2.0, 0.1)])


@dataclass
class _Config:
    wasserstein: _WConfig = None


def test_compute_batches_match_per_pair(tmp_path, monkeypatch):
    masses = {
        ("run_a", 1.0): _mass_image(1),
        ("run_b", 1.0): _mass_image(2),
        ("run_c", 1.0): _mass_image(3),
        ("run_a", 2.0): _mass_image(4),
        ("run_b", 2.0): _mass_image(5),
        ("run_c", 2.0): _mass_image(6),
    }

    def fake_load(run_name, config, time, tol, resize_factor):
        return masses.get((str(run_name), float(time)))

    monkeypatch.setattr(cw, "_load_mass", fake_load)
    config = _Config(wasserstein=_WConfig(results=tmp_path))
    results = cw._compute(None, config, skip_existing=False)
    # 3 runs -> 3 pairs, 2 times -> 6 results.
    assert len(results) == 6
    # Batched distances equal the per-pair facade solves.
    for result in results:
        expected = float(
            da.wasserstein_distance(
                masses[(result.run_a, result.time)],
                masses[(result.run_b, result.time)],
                method="newton",
            )
        )
        assert result.distance == pytest.approx(expected, rel=2e-3)
        assert (tmp_path / result.get_result_filename()).exists()
    # Assemble step reads the saved artifacts into a CSV.
    df = cw._assemble(config)
    assert len(df) == 6
    assert (tmp_path / "wasserstein_distances.csv").exists()


def test_compute_skips_mass_mismatch(tmp_path, monkeypatch):
    big = _mass_image(1)
    small = da.Image(np.asarray(big.img) * 0.1, width=1.0, height=1.0, scalar=True)

    def fake_load(run_name, config, time, tol, resize_factor):
        return big if str(run_name) == "run_a" else small

    monkeypatch.setattr(cw, "_load_mass", fake_load)
    wconfig = _WConfig(results=tmp_path, runs=["run_a", "run_b"],
                       times=[(1.0, 0.1)], relative_tol=0.2)
    results = cw._compute(None, _Config(wasserstein=wconfig), skip_existing=False)
    assert results == []
