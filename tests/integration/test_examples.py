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

EXAMPLES = sorted(
    p.name for p in EXAMPLES_DIR.glob("*.py") if not p.name.startswith("_")
)

# Per-example generous timeouts (first-run XLA compiles dominate).
SLOW = {
    "wasserstein.py",
    "wasserstein_split_square.py",
    "image_registration.py",
    "distances.py",
    "co2_and_tracer_analysis.py",
}


RUNNER = Path(__file__).parent / "_run_example.py"


@pytest.mark.parametrize("example", EXAMPLES)
def test_example_runs(example):
    env = dict(os.environ)
    env.setdefault("MPLBACKEND", "Agg")
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
