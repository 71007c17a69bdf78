"""Which side of the W1 certificate is loose on the bench problem?

Reproduces bench.measure_wasserstein's 512^2 weighted sharp-support problem,
then separately tightens (a) the dual — longer/warm-started CP polish in
chunks until the certified value stalls — and (b) the primal — Bregman
refinement warm-started from the Newton flux.  Whichever moves the gap
decides the round-5 fix (VERDICT r4 next #4).

Usage: python tools/gap_experiment.py [n]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import darsia_tpu as da  # noqa: E402
from darsia_tpu.measure.beckmann import BeckmannNewtonSolver  # noqa: E402
from darsia_tpu.utils.grid import generate_grid  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    src = np.zeros((n, n))
    dst = np.zeros((n, n))
    q = n // 10
    src[2 * q : 5 * q, 2 * q : 5 * q] = 1.0
    dst[1 * q : 3 * q, 1 * q : 2 * q] = 1.0
    dst[4 * q : 7 * q, 7 * q : 9 * q] = 1.0
    meta = {"width": 1, "height": 1, "scalar": True}
    src_img, dst_img = da.Image(src, **meta), da.Image(dst, **meta)
    geometry = da.Geometry(**src_img.shape_metadata())
    src_img.img = np.asarray(src_img.img) / geometry.integrate(src_img)
    dst_img.img = np.asarray(dst_img.img) / geometry.integrate(dst_img)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij"
    )
    weight = da.ScalarImage(
        (2.0 + np.sin(4 * np.pi * xx) * np.cos(2 * np.pi * yy)).astype(
            np.float32
        ),
        width=1,
        height=1,
    )
    options = {
        "num_iter": 500,
        "L": 1e9,
        "tol_increment": 1e-4,
        "tol_distance": 1e-4,
        "aa_depth": 5,
    }
    solver = BeckmannNewtonSolver(generate_grid(dst_img), weight, options)
    mass_diff = jnp.asarray(
        np.asarray(dst_img.img) - np.asarray(src_img.img), jnp.float32
    )
    distance, fluxes, pressure, info = solver.solve_beckmann_problem(mass_diff)
    distance = float(distance)
    print(f"newton distance: {distance:.6f}  iters {info['number_iterations']}")

    mass_rhs = solver.cell_vol * jnp.asarray(mass_diff, solver.dtype)

    # -- (a) dual side: adaptive chunked CP polish (persistent carry) ------
    dual_raw = solver.dual_value(pressure, mass_diff, refine=True)
    print(f"dual (blur sweep): {dual_raw:.6f}  gap {(distance-dual_raw)/distance:.3e}")
    if solver._dual_polish_fn is None:
        solver._build_dual_polish()
    p0 = jnp.asarray(pressure, solver.dtype)
    carry = (p0, p0, solver._dual_polish_z0())
    best = dual_raw
    total = 0
    for chunk in range(16):
        tic = time.time()
        carry = solver._dual_polish_chunk(carry, mass_rhs, 2000)
        total += 2000
        val = float(solver._dual_value_best(carry[0], mass_rhs))
        best = max(best, val)
        gap = (distance - best) / distance
        print(
            f"polish {total:5d}: dual {val:.6f} best {best:.6f} "
            f"gap {gap:.3e}  ({time.time()-tic:.1f}s)"
        )
        if gap < 5e-4:
            break

    # -- (b) primal side: Bregman refinement from the Newton flux ----------
    from darsia_tpu.measure.beckmann import BeckmannBregmanSolver

    bopts = dict(options)
    bopts.update({"num_iter": 300, "L": 2.0, "tol_increment": 1e-7,
                  "tol_distance": 1e-7})
    bsolver = BeckmannBregmanSolver(generate_grid(dst_img), weight, bopts)
    bdist, bfluxes, bp, binfo = bsolver.solve_beckmann_problem(mass_diff)
    print(f"bregman-from-scratch distance: {float(bdist):.6f} "
          f"iters {binfo['number_iterations']}")
    # A lower feasible primal value than Newton's means the primal side was
    # the loose one.
    print(f"primal improvement vs newton: {distance - float(bdist):.6e}")
    final_gap = (min(distance, float(bdist)) - best) / min(distance, float(bdist))
    print(f"best-primal vs best-dual gap: {final_gap:.3e}")


if __name__ == "__main__":
    main()
