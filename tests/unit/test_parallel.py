"""Sharded TPFA CG vs single-device reference on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from darsia_tpu.measure.beckmann_kernels import tpfa_apply, tpfa_cg
from darsia_tpu.parallel.tpfa import sharded_tpfa_cg


def test_sharded_tpfa_cg_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("Needs the 8-device CPU mesh.")
    H, W = 64, 48
    rng = np.random.default_rng(0)
    tr = jnp.asarray(rng.uniform(0.5, 2.0, (H - 1, W)), jnp.float32)
    tc = jnp.asarray(rng.uniform(0.5, 2.0, (H, W - 1)), jnp.float32)
    rhs_np = rng.standard_normal((H, W)).astype(np.float32)
    rhs_np -= rhs_np.mean()
    rhs = jnp.asarray(rhs_np)

    ref = tpfa_cg(
        (tr, tc), rhs, jnp.zeros((H, W), jnp.float32),
        dim=2, tol=1e-8, maxiter=3000,
    )
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("space",))
    solve = sharded_tpfa_cg(mesh, (H, W), tol=1e-8, maxiter=3000)
    out = solve(tr, tc, rhs)

    a = np.array(ref, copy=True) - float(np.mean(np.array(ref)))
    b = np.array(out, copy=True) - float(np.mean(np.array(out)))
    assert np.abs(a - b).max() < 1e-4 * max(np.abs(a).max(), 1e-30)
    residual = np.array(tpfa_apply(jnp.asarray(b), (tr, tc), 2)) - rhs_np
    assert np.abs(residual).max() < 1e-3
