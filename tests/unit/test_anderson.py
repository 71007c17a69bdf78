"""Anderson acceleration: host class vs the traceable in-loop variant.

The host class mirrors reference ``src/darsia/utils/andersonacceleration.py``;
``anderson_init``/``anderson_mix`` are the pure-JAX re-expression that runs
inside fused ``lax.while_loop`` solvers (static-shape ring buffers,
ridge-augmented QR mixing).  Parity between the two is the correctness
contract for fusing the acceleration into the Newton/Bregman device loops.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import darsia_tpu as da
from darsia_tpu.utils.andersonacceleration import (
    AndersonAcceleration,
    anderson_init,
    anderson_mix,
)


def _linear_fixed_point(dim=24, seed=0):
    """Contractive affine map x -> Mx + c with spectral radius < 1."""
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((dim, dim)).astype(np.float32)
    M *= 0.9 / np.max(np.abs(np.linalg.eigvals(M)))
    c = rng.standard_normal(dim).astype(np.float32)
    return M, c


@pytest.mark.parametrize("depth", [2, 5])
@pytest.mark.parametrize("restart", [None, 7])
def test_anderson_mix_matches_host_class(depth, restart):
    """The traced mixing reproduces the host lstsq trajectory."""
    dim = 24
    M, c = _linear_fixed_point(dim)
    host = AndersonAcceleration(dimension=dim, depth=depth, restart=restart)
    state = anderson_init(dim, depth)

    x_host = np.zeros(dim, dtype=np.float32)
    x_dev = jnp.zeros(dim, dtype=jnp.float32)
    mix = jax.jit(lambda s, g, f: anderson_mix(s, g, f, restart=restart))
    for it in range(16):
        g_host = M @ x_host + c
        x_host = host(g_host, g_host - x_host, it)

        g_dev = jnp.asarray(M) @ x_dev + jnp.asarray(c)
        state, x_dev = mix(state, g_dev, g_dev - x_dev)

        np.testing.assert_allclose(
            np.asarray(x_dev), x_host, rtol=2e-3, atol=2e-3
        )


def test_anderson_mix_accelerates():
    """Anderson(5) converges the linear fixed point much faster."""
    dim = 24
    M, c = _linear_fixed_point(dim, seed=3)
    x_star = np.linalg.solve(np.eye(dim) - M, c)

    def run(depth, iters=40):
        x = jnp.zeros(dim, dtype=jnp.float32)
        state = anderson_init(dim, depth) if depth else None
        for _ in range(iters):
            g = jnp.asarray(M) @ x + jnp.asarray(c)
            if depth:
                state, x = anderson_mix(state, g, g - x)
            else:
                x = g
        return float(jnp.linalg.norm(x - jnp.asarray(x_star)))

    assert run(5) < 1e-2 * run(0)


def _small_weighted_problem(n=48):
    q = n // 8
    src = np.zeros((n, n), np.float32)
    src[q : 3 * q, q : 3 * q] = 1
    dst = np.zeros((n, n), np.float32)
    dst[4 * q : 6 * q, 5 * q : 7 * q] = 1
    src_img = da.ScalarImage(src, width=1, height=1)
    dst_img = da.ScalarImage(dst, width=1, height=1)
    geometry = da.Geometry(**src_img.shape_metadata())
    src_img.img = np.asarray(src_img.img) / geometry.integrate(src_img)
    dst_img.img = np.asarray(dst_img.img) / geometry.integrate(dst_img)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij"
    )
    weight = da.ScalarImage(
        (1.5 + np.sin(2 * np.pi * xx) * np.cos(np.pi * yy)).astype(np.float32),
        width=1,
        height=1,
    )
    mass_diff = jnp.asarray(
        np.asarray(dst_img.img) - np.asarray(src_img.img), jnp.float32
    )
    return dst_img, weight, mass_diff


def test_fused_newton_anderson_matches_host_loop():
    """aa_depth > 0 runs inside the fused device loop and reproduces the
    eager host-loop acceleration (same distance, comparable iterations)."""
    import contextlib
    import io

    from darsia_tpu.measure.beckmann import BeckmannNewtonSolver
    from darsia_tpu.utils.grid import generate_grid

    dst_img, weight, mass_diff = _small_weighted_problem()
    base = {
        "num_iter": 400,
        "L": 1e9,
        "tol_increment": 1e-4,
        "tol_distance": 1e-4,
        "aa_depth": 5,
    }

    fused = BeckmannNewtonSolver(generate_grid(dst_img), weight, base)
    d_fused, _, _, info_fused = fused.solve_beckmann_problem(mass_diff)

    host = BeckmannNewtonSolver(
        generate_grid(dst_img), weight, {**base, "verbose": True}
    )
    with contextlib.redirect_stdout(io.StringIO()):
        d_host, _, _, info_host = host.solve_beckmann_problem(mass_diff)

    assert info_fused["converged"]
    assert info_host["converged"]
    assert abs(float(d_fused) - float(d_host)) < 1e-4
    it_fused = info_fused["number_iterations"]
    it_host = info_host["number_iterations"]
    assert it_fused <= 2 * it_host + 10


def test_bregman_anderson_fused_and_host_paths():
    """Anderson on the [aux, force] pair (reference
    beckmann_bregman_solver.py:267-281): both the fused device loop and
    the eager host loop accept aa_depth and stay near the anchor."""
    import contextlib
    import io

    rows = cols = 10
    src = np.zeros((rows, cols))
    src[2:5, 2:5] = 1
    dst = np.zeros((rows, cols))
    dst[1:3, 1:2] = 1
    dst[4:7, 7:9] = 1
    meta = {"width": 1, "height": 1, "space_dim": 2, "scalar": True}
    src_img, dst_img = da.Image(src, **meta), da.Image(dst, **meta)
    geometry = da.Geometry(**src_img.shape_metadata())
    src_img.img = np.asarray(src_img.img) / geometry.integrate(src_img)
    dst_img.img = np.asarray(dst_img.img) / geometry.integrate(dst_img)

    base = {
        "l1_mode": da.L1Mode.CONSTANT_CELL_PROJECTION,
        "mobility_mode": da.MobilityMode.CELL_BASED,
        "num_iter": 400,
        "tol_increment": 1e-4,
        "tol_distance": 1e-4,
        "L": 1.0,
        "aa_depth": 5,
        "return_info": True,
    }
    d_fused, info_fused = da.wasserstein_distance(
        src_img, dst_img, options=base, method="bregman"
    )
    with contextlib.redirect_stdout(io.StringIO()):
        d_host, info_host = da.wasserstein_distance(
            src_img,
            dst_img,
            options={**base, "verbose": True},
            method="bregman",
        )
    anchor = 0.379543951823
    assert abs(float(d_fused) - anchor) / anchor < 2e-2
    assert abs(float(d_host) - anchor) / anchor < 1e-1


def test_fused_newton_anderson_reduces_iterations():
    """The accelerated fused loop needs far fewer Newton iterations."""
    from darsia_tpu.measure.beckmann import BeckmannNewtonSolver
    from darsia_tpu.utils.grid import generate_grid

    dst_img, weight, mass_diff = _small_weighted_problem()
    base = {
        "num_iter": 400,
        "L": 1e9,
        "tol_increment": 1e-4,
        "tol_distance": 1e-4,
    }

    plain = BeckmannNewtonSolver(generate_grid(dst_img), weight, base)
    d0, _, _, info0 = plain.solve_beckmann_problem(mass_diff)
    accel = BeckmannNewtonSolver(
        generate_grid(dst_img), weight, {**base, "aa_depth": 5}
    )
    d1, _, _, info1 = accel.solve_beckmann_problem(mass_diff)

    assert info1["converged"]
    assert abs(float(d0) - float(d1)) < 5e-4
    assert info1["number_iterations"] < 0.6 * max(info0["number_iterations"], 1)
