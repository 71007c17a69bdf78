"""Run one example script on the CPU backend (hermetic integration runs).

Usage: python _run_example.py /path/to/example.py

This environment may pin a hardware platform via sitecustomize (the
JAX_PLATFORMS env var is overridden), so the CPU backend must be forced
via jax.config before any device is touched — same approach as
tests/conftest.py.
"""

import os
import runpy
import sys
from pathlib import Path

example = Path(sys.argv[1]).resolve()

os.environ.setdefault("MPLBACKEND", "Agg")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, str(example.parent))
os.chdir(example.parent)
runpy.run_path(str(example), run_name="__main__")
