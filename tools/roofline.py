"""Roofline measurement of the headline per-frame pipeline (docs/roofline.md).

Times truncated prefixes of the classic TWO-WARP `step` program (the
headline lane through round 4; bench.py's `make_step(one_warp=False)`) on
the real TPU (same setup, same shapes); successive differences attribute
the 4K frame time to stages.  The round-5 one-warp headline lane replaces
the two gather passes this breakdown identified as 64% of the frame with
one (docs/roofline.md lever 1); its stages are a strict subset, so the
two-warp attribution remains the informative one.  Alongside, measures the in-situ HBM bandwidth
ceiling with a pure streaming program (y = x * a on a 256 MB array), so each
stage's bytes-moved model can be read as a fraction of what THIS chip (and
tunnel) actually sustains — the number that decides "optimize further or
declare bandwidth-bound".

Usage:  python tools/roofline.py   (writes JSON to stdout; paste into
docs/roofline.md tables)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench  # noqa: E402
from darsia_tpu.corrections.shape.curvature import CurvatureCorrection  # noqa: E402
from darsia_tpu.ops.fft import (  # noqa: E402
    phase_correlation_prepared,
    prepare_phase_reference,
)
from darsia_tpu.ops.pallas.warp2pass import warp_two_pass_planar  # noqa: E402
from darsia_tpu.ops.solvers import jacobi_solve  # noqa: E402
from darsia_tpu.ops.warp import identity_grid  # noqa: E402
from darsia_tpu.utils.interpolation import _tps_kernel  # noqa: E402

REPS = 30


def _sync(out) -> None:
    """Fetch ONE scalar (device-side slice first: a full-array fetch costs
    seconds over the tunneled link and complex arrays cannot transfer)."""
    probe = out.ravel()[0]
    if jnp.iscomplexobj(probe):
        probe = jnp.real(probe)
    _ = float(np.asarray(probe))


def _time(fn, *args) -> float:
    """Steady-state seconds per call (async dispatches + one scalar sync)."""
    out = fn(*args)
    _sync(out)  # compile + sync
    tic = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - tic) / REPS


def measure_hbm_ceiling() -> dict:
    """In-situ streaming bandwidth: y = 2*x on a 256 MB f32 array.

    Reads + writes 2 bytes/byte -> achieved GB/s = 2 * nbytes / t.  This is
    the realistic ceiling for gather-light elementwise work on this chip.
    """
    n = 64 * 1024 * 1024  # 256 MB f32
    x = jnp.arange(n, dtype=jnp.float32)
    f = jax.jit(lambda v: v * 2.0)
    t = _time(f, x)
    return {"stream_bytes": 2 * n * 4, "stream_s": t, "stream_gb_s": 2 * n * 4 / t / 1e9}


def main() -> None:
    base_u8 = bench._load_image()
    H, W = base_u8.shape[:2]

    # ---- identical setup to bench.main() ----------------------------------
    curv = CurvatureCorrection(
        config={
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
    )
    curv._precompute_transformed_coordinates((H, W))
    curvature_grid = jnp.asarray(curv.cache["grid"], dtype=jnp.float32)
    out_shape = tuple(int(s) for s in curv.cache["shape"])
    OH, OW = out_shape

    balance = jnp.asarray(
        np.array(
            [[1.04, 0.01, 0.0], [0.0, 1.02, 0.01], [0.01, 0.0, 1.05]],
            dtype=np.float32,
        )
    )
    NP_I, NP_J = 8, 16
    pv = (int(np.ceil(OH / NP_I)), int(np.ceil(OW / NP_J)))
    win = (256, 256)
    centers = np.array(
        [
            [
                min(int((i + 0.5) * pv[0]), OH - 1),
                min(int((j + 0.5) * pv[1]), OW - 1),
            ]
            for i in range(NP_I)
            for j in range(NP_J)
        ],
        dtype=np.int32,
    )
    centers_xy = np.stack([centers[:, 1], centers[:, 0]], axis=1).astype(
        np.float32
    )
    bc = []
    for y in np.linspace(0, OH, NP_I + 1):
        bc.append([0.0, y])
        bc.append([float(OW), y])
    for x in np.linspace(0, OW, NP_J + 1):
        bc.append([x, float(OH)])
    bc = np.unique(np.array(bc, dtype=np.float32), axis=0)
    pts = np.concatenate([centers_xy, bc], axis=0)
    n_pts = pts.shape[0]
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        K = np.where(d > 0, d * d * np.log(np.where(d > 0, d, 1.0)), 0.0)
    poly = np.concatenate([np.ones((n_pts, 1)), pts], axis=1)
    A = np.block([[K, poly], [poly.T, np.zeros((3, 3))]])
    Ainv = jnp.asarray(np.linalg.inv(A), dtype=jnp.float32)
    centers_dev = jnp.asarray(centers)
    pts_dev = jnp.asarray(pts)
    p_sq = jnp.sum(pts_dev * pts_dev, axis=-1)[None, :]
    CH, CW = (OH + 15) // 16, (OW + 15) // 16
    rows, cols = np.meshgrid(
        np.linspace(0, OH - 1, CH, dtype=np.float32),
        np.linspace(0, OW - 1, CW, dtype=np.float32),
        indexing="ij",
    )
    query = jnp.asarray(
        np.stack([cols.ravel(), rows.ravel()], axis=1), dtype=jnp.float32
    )
    id_grid = identity_grid((OH, OW))
    limits = jnp.array([OH - win[0], OW - win[1]], dtype=jnp.int32)

    def extract_windows(gray):
        def get(c):
            start = jnp.clip(c - jnp.array(win, dtype=jnp.int32) // 2, 0, limits)
            return lax.dynamic_slice(gray, (start[0], start[1]), win)

        return jax.vmap(get)(centers_dev)

    def rbf_weights(values):
        rhs = jnp.concatenate([values, jnp.zeros(3, dtype=jnp.float32)])
        return Ainv @ rhs

    def eval_displacement(wx, wy):
        q_sq = jnp.sum(query * query, axis=-1, keepdims=True)
        cross = jnp.matmul(query, pts_dev.T, precision="highest")
        r = jnp.sqrt(jnp.maximum(q_sq - 2 * cross + p_sq, 0.0))
        Kq = _tps_kernel(r)
        dx = (Kq @ wx[:n_pts] + wx[n_pts] + query @ wx[n_pts + 1 :]).reshape(
            CH, CW
        )
        dy = (Kq @ wy[:n_pts] + wy[n_pts] + query @ wy[n_pts + 1 :]).reshape(
            CH, CW
        )
        dxy = jax.image.resize(jnp.stack([dy, dx]), (2, OH, OW), method="linear")
        return dxy[1], dxy[0]

    id_in = identity_grid((OH, OW))
    curv_disp = int(np.ceil(float(jnp.max(jnp.abs(curvature_grid - id_in))))) + 1
    GRAY_W = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)

    # ---- truncated prefixes of the headline step ---------------------------
    def s0_convert(img_u8, base_spectra, base_corrected):
        return img_u8.astype(jnp.float32) / 255.0

    def s1_balance(img_u8, base_spectra, base_corrected):
        img = img_u8.astype(jnp.float32) / 255.0
        return jnp.einsum("chw,cd->dhw", img, balance, precision="highest")

    def s2_curv_warp(img_u8, base_spectra, base_corrected):
        balanced = s1_balance(img_u8, base_spectra, base_corrected)
        return warp_two_pass_planar(balanced, curvature_grid, curv_disp)

    def s3_phasecorr(img_u8, base_spectra, base_corrected):
        corrected = s2_curv_warp(img_u8, base_spectra, base_corrected)
        gray = jnp.tensordot(GRAY_W, corrected, axes=([0], [0]))
        windows = extract_windows(gray)
        shifts, quality = jax.vmap(
            lambda f, w: phase_correlation_prepared(f, w, win)
        )(base_spectra, windows)
        return shifts

    def _through_tps(img_u8, base_spectra, base_corrected):
        corrected = s2_curv_warp(img_u8, base_spectra, base_corrected)
        gray = jnp.tensordot(GRAY_W, corrected, axes=([0], [0]))
        windows = extract_windows(gray)
        shifts, quality = jax.vmap(
            lambda f, w: phase_correlation_prepared(f, w, win)
        )(base_spectra, windows)
        accept = (quality > 0.02)[:, None]
        shifts = jnp.where(accept, shifts, 0.0)
        vx = jnp.concatenate(
            [shifts[:, 1], jnp.zeros(bc.shape[0], dtype=jnp.float32)]
        )
        vy = jnp.concatenate(
            [shifts[:, 0], jnp.zeros(bc.shape[0], dtype=jnp.float32)]
        )
        dx, dy = eval_displacement(rbf_weights(vx), rbf_weights(vy))
        return corrected, dx, dy

    def s4_tps(img_u8, base_spectra, base_corrected):
        corrected, dx, dy = _through_tps(img_u8, base_spectra, base_corrected)
        return dx

    def s5_reg_warp(img_u8, base_spectra, base_corrected):
        corrected, dx, dy = _through_tps(img_u8, base_spectra, base_corrected)
        dx = jnp.clip(dx, -119.0, 119.0)
        dy = jnp.clip(dy, -119.0, 119.0)
        coords = id_grid + jnp.stack([-dy, -dx], axis=0)
        return warp_two_pass_planar(corrected, coords, 120)

    def s6_diff_gray(img_u8, base_spectra, base_corrected):
        registered = s5_reg_warp(img_u8, base_spectra, base_corrected)
        diff = jnp.clip(registered - base_corrected, 0.0, None)
        return jnp.tensordot(GRAY_W, diff, axes=([0], [0]))

    def s7_full(img_u8, base_spectra, base_corrected):
        signal = s6_diff_gray(img_u8, base_spectra, base_corrected)
        restored = jacobi_solve(signal, signal, 1.0, 0.2, dim=2, maxiter=10)
        return 2.0 * restored

    stages = [
        ("u8->f32 convert", s0_convert),
        ("+ color balance (einsum)", s1_balance),
        ("+ curvature warp (pallas 2-pass)", s2_curv_warp),
        ("+ gray + 128x windows + phase corr (FFT)", s3_phasecorr),
        ("+ TPS solve + coarse eval + upsample", s4_tps),
        ("+ registration warp (pallas 2-pass)", s5_reg_warp),
        ("+ diff + gray reduction", s6_diff_gray),
        ("+ 10 Jacobi sweeps + model (FULL step)", s7_full),
    ]

    # Baseline-side precompute (same as bench.main).
    base_dev = jnp.asarray(np.moveaxis(base_u8, -1, 0))
    base_corrected = warp_two_pass_planar(
        jnp.einsum(
            "chw,cd->dhw",
            base_dev.astype(jnp.float32) / 255.0,
            balance,
            precision="highest",
        ),
        curvature_grid,
        curv_disp,
    )
    base_windows = extract_windows(
        jnp.tensordot(GRAY_W, base_corrected, axes=([0], [0]))
    )
    base_spectra = jax.vmap(prepare_phase_reference)(base_windows)
    _sync(base_spectra)

    probe = np.moveaxis(np.roll(base_u8, shift=(2, 3), axis=(0, 1)), -1, 0)
    probe_dev = jnp.asarray(probe)

    results = {"H": OH, "W": OW, "reps": REPS}
    prev = 0.0
    rows_out = []
    for name, fn in stages:
        t = _time(jax.jit(fn), probe_dev, base_spectra, base_corrected)
        rows_out.append({"stage": name, "cum_ms": t * 1e3, "delta_ms": (t - prev) * 1e3})
        prev = t
        print(f"# {name}: cum {t*1e3:.2f} ms, delta {(t-prev)*1e3:+.2f}", file=sys.stderr)
    results["stages"] = rows_out
    results.update(measure_hbm_ceiling())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
