import sys, time
sys.path.insert(0, "/root/repo")
import warnings; warnings.simplefilter("ignore")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
exec(open("/root/repo/bench.py").read().split("def main()")[0])
import bench as B  # reuse helpers? no - inline
import importlib
# Rebuild the bench setup by running main() pieces manually is complex;
# instead monkeypatch step variations via environment flag in a copy.
