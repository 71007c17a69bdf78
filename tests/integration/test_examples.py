"""Examples as integration tests.

Mirrors `/root/reference/tests/integration/test_examples.py:7-91`: every
example script must execute with exit code 0 — the examples double as the
end-to-end suite.  Runs headless (MPLBACKEND=Agg) on the CPU mesh.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES_DIR = Path(__file__).resolve().parents[2] / "examples"

# Heavier examples (multiple XLA programs / larger problems) carry the
# "slow" marker: `pytest tests/integration -m "not slow"` runs the quick
# majority.  ALL examples run in fast mode by default (DARSIA_TPU_FAST=1:
# downscaled inputs, fewer refinement levels) so a cold-cache full suite
# finishes in minutes; set DARSIA_TPU_FULL_EXAMPLES=1 to run each example
# at its reference-mirroring scale.
SLOW = {
    "wasserstein.py",
    "wasserstein_split_square.py",
    "image_registration.py",
    "distances.py",
    "co2_and_tracer_analysis.py",
}

EXAMPLES = sorted(
    p.name for p in EXAMPLES_DIR.glob("*.py") if not p.name.startswith("_")
)
PARAMS = [
    pytest.param(name, marks=pytest.mark.slow) if name in SLOW else name
    for name in EXAMPLES
]


RUNNER = Path(__file__).parent / "_run_example.py"


@pytest.mark.parametrize("example", PARAMS)
def test_example_runs(example):
    env = dict(os.environ)
    env.setdefault("MPLBACKEND", "Agg")
    full = env.get("DARSIA_TPU_FULL_EXAMPLES", "") not in ("", "0")
    if not full:
        env.setdefault("DARSIA_TPU_FAST", "1")
    timeout = 900 if example in SLOW else 420
    # The runner forces the CPU backend in-process (the JAX_PLATFORMS env
    # var is overridden by this environment's sitecustomize).
    result = subprocess.run(
        [sys.executable, str(RUNNER), str(EXAMPLES_DIR / example)],
        cwd=EXAMPLES_DIR,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert result.returncode == 0, (
        f"{example} failed (rc={result.returncode})\n"
        f"stdout:\n{result.stdout[-2000:]}\nstderr:\n{result.stderr[-2000:]}"
    )
