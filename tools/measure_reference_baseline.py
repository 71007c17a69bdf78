"""Measure the reference's CPU wall-times for the BASELINE.md configs.

BASELINE.md's rule: "Reference-side numbers must be *measured* on the
examples suite (CPU) during the build, since none are published."  This
script runs the actual upstream package (via the fidelity loader's stubs,
``tests/fidelity/_reference.py``) on the validation configs that run
without its unavailable optional deps, times them, and prints a JSON
summary plus a markdown table for BASELINE.md.

Measured configs:

1. Beckmann W1 Newton, split-square problem at 160^2 (the
   ``examples/wasserstein_split_square.py`` config) and 512^2 — reference
   scipy-splu direct backend (pyamg/PETSc are not installed; the
   reference's own fallback chain ends at splu) vs darsia_tpu's fused
   MG-PCG Newton on the same problems (CPU here; TPU numbers live in
   PERF_HISTORY.jsonl).
2. Anisotropic split-Bregman TVD on a noisy 512^2 image (numpy-vectorized
   shrinkage path; the isotropic path is numba-jitted upstream and numba
   is not installed — a pass-through stub would measure interpreted Python
   loops, unfair to the reference).
3. Per-image curvature correction (cv2.remap) on the 4K baseline photo,
   reference ``CurvatureCorrection.correct_array`` vs the fused chain.

Usage: python tools/measure_reference_baseline.py [--full]
  --full includes the 512^2 W1 solve (minutes on CPU).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

W1_OPTIONS = {
    "L": 1e9,
    "num_iter": 400,
    "tol_residual": 1e-3,
    "tol_increment": 1e-3,
    "tol_distance": 1e-3,
    "return_info": False,
    "verbose": False,
}


def _split_square_problem(module, n: int):
    """The examples/wasserstein_split_square.py problem at resolution n."""
    rows = cols = 10
    src = np.zeros((rows, cols), dtype=float)
    src[2:5, 2:5] = 1
    dst = np.zeros((rows, cols), dtype=float)
    dst[1:3, 1:2] = 1
    dst[4:7, 7:9] = 1
    meta = {"width": 1, "height": 1, "space_dim": 2, "scalar": True}
    src_img = module.Image(src, **meta)
    dst_img = module.Image(dst, **meta)
    geometry = module.Geometry(**src_img.shape_metadata())
    src_img.img = np.asarray(src_img.img) / float(geometry.integrate(src_img))
    dst_img.img = np.asarray(dst_img.img) / float(geometry.integrate(dst_img))
    resize = module.Resize(
        **{
            "resize shape": (n, n),
            "resize interpolation": "inter_nearest",
        }
    )
    src_img, dst_img = resize(src_img), resize(dst_img)
    # Re-normalize masses: nearest refinement to a non-2^k multiple of the
    # base grid replicates cells unevenly, and the solvers assert equal
    # masses up to a tight tolerance.
    geometry = module.Geometry(**src_img.shape_metadata())
    src_img.img = np.asarray(src_img.img) / float(geometry.integrate(src_img))
    dst_img.img = np.asarray(dst_img.img) / float(geometry.integrate(dst_img))
    return src_img, dst_img


def measure_ref_w1(ref, n: int) -> dict:
    src, dst = _split_square_problem(ref, n)
    options = dict(W1_OPTIONS)
    options.update({"linear_solver": "direct", "formulation": "full",
                    "aa_depth": 0, "aa_restart": None})
    tic = time.perf_counter()
    distance = ref.wasserstein_distance(
        src, dst, method="newton", options=options
    )
    elapsed = time.perf_counter() - tic
    return {"s": round(elapsed, 2), "distance": round(float(distance), 6)}


def measure_our_w1(n: int) -> dict:
    import darsia_tpu as dt

    src, dst = _split_square_problem(dt, n)
    distance, _, _, info = None, None, None, None
    options = dict(W1_OPTIONS)
    tic = time.perf_counter()
    distance = dt.wasserstein_distance(src, dst, method="newton", options=options)
    cold = time.perf_counter() - tic
    tic = time.perf_counter()
    distance = dt.wasserstein_distance(src, dst, method="newton", options=options)
    warm = time.perf_counter() - tic
    return {
        "s_cold": round(cold, 2),
        "s": round(warm, 2),
        "distance": round(float(distance), 6),
    }


def measure_ref_tvd(ref, n: int = 512, iters: int = 30) -> dict:
    rng = np.random.default_rng(0)
    img = np.clip(
        np.kron(rng.random((n // 32, n // 32)), np.ones((32, 32)))
        + 0.1 * rng.standard_normal((n, n)),
        0,
        1,
    )
    tic = time.perf_counter()
    ref.split_bregman_tvd(img, mu=10.0, ell=1.0, max_num_iter=iters,
                          isotropic=False, eps=None)
    elapsed = time.perf_counter() - tic
    return {"s": round(elapsed, 2), "iters_per_s": round(iters / elapsed, 2)}


def measure_our_tvd(n: int = 512, iters: int = 30) -> dict:
    import jax
    import darsia_tpu as dt

    rng = np.random.default_rng(0)
    img = np.clip(
        np.kron(rng.random((n // 32, n // 32)), np.ones((32, 32)))
        + 0.1 * rng.standard_normal((n, n)),
        0,
        1,
    ).astype(np.float32)
    run = lambda: dt.split_bregman_tvd(  # noqa: E731
        img, mu=10.0, ell=1.0, max_num_iter=iters, isotropic=False, eps=None
    )
    jax.block_until_ready(run())  # compile
    tic = time.perf_counter()
    jax.block_until_ready(run())
    elapsed = time.perf_counter() - tic
    return {"s": round(elapsed, 2), "iters_per_s": round(iters / elapsed, 2)}


def _curvature_config(H: int, W: int) -> dict:
    return {
        "crop": {
            "pts_src": [[8, 11], [H - 33, 16], [H - 40, W - 15], [5, W - 15]],
            "width": 2.8,
            "height": 1.5,
        },
        "bulge": {
            "horizontal_bulge": -1e-9,
            "vertical_bulge": -2.7e-8,
            "vertical_center_offset": -31,
        },
    }


def measure_ref_curvature(ref, img_u8: np.ndarray, reps: int = 3) -> dict:
    H, W = img_u8.shape[:2]
    corr = ref.CurvatureCorrection(config=_curvature_config(H, W))
    corr.correct_array(img_u8)  # warm caches
    tic = time.perf_counter()
    for _ in range(reps):
        out = corr.correct_array(img_u8)
    elapsed = (time.perf_counter() - tic) / reps
    return {"s_per_image": round(elapsed, 4), "out_shape": list(out.shape)}


def measure_our_curvature(img_u8: np.ndarray, reps: int = 3) -> dict:
    import jax.numpy as jnp
    import darsia_tpu as dt

    H, W = img_u8.shape[:2]
    corr = dt.CurvatureCorrection(config=_curvature_config(H, W))
    dev = jnp.asarray(img_u8)
    out = corr.correct_array(dev)
    float(np.asarray(out[0, 0, 0]))
    tic = time.perf_counter()
    for _ in range(reps):
        out = corr.correct_array(dev)
    float(np.asarray(out[0, 0, 0]))
    elapsed = (time.perf_counter() - tic) / reps
    return {"s_per_image": round(elapsed, 4), "out_shape": list(out.shape)}


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # measure CPU-vs-CPU
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from fidelity._reference import load_reference

    ref = load_reference()
    assert ref is not None, "reference import failed"

    results: dict = {"hardware": "container CPU (single process)"}

    results["ref_w1_newton_160"] = measure_ref_w1(ref, 160)
    results["our_w1_newton_160_cpu"] = measure_our_w1(160)
    if "--full" in sys.argv:
        results["ref_w1_newton_512"] = measure_ref_w1(ref, 512)
        results["our_w1_newton_512_cpu"] = measure_our_w1(512)

    results["ref_tvd_aniso_512x30"] = measure_ref_tvd(ref)
    results["our_tvd_aniso_512x30_cpu"] = measure_our_tvd()

    img_path = Path("/root/reference/examples/images/baseline.jpg")
    if img_path.exists():
        import cv2

        img = cv2.cvtColor(
            cv2.imread(str(img_path), cv2.IMREAD_UNCHANGED), cv2.COLOR_BGR2RGB
        )
        results["ref_curvature_4k"] = measure_ref_curvature(ref, img)
        results["our_curvature_4k_cpu"] = measure_our_curvature(img)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
