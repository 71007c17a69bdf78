"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests emulate a TPU slice on the host, following the
standard JAX practice (XLA_FLAGS=--xla_force_host_platform_device_count).
Must run before the first `import jax`.
"""

import os
import sys

# NOTE: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the
# env var alone is NOT enough — the jax.config update below is what forces
# the CPU backend with 8 virtual devices for sharding tests.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeat test runs skip XLA recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
