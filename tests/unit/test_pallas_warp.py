"""Pallas two-pass warp tests (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import darsia_tpu as da


def test_two_pass_translation_exact():
    import jax.numpy as jnp

    from darsia_tpu.ops.pallas.warp2pass import warp_two_pass
    from darsia_tpu.ops.warp import identity_grid, warp

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((96, 160, 3)), dtype=jnp.float32)
    coords = identity_grid((96, 160)) + jnp.array([3.25, -2.5])[:, None, None]
    ref = np.asarray(warp(img, coords, order=1, mode="nearest"))
    out = np.asarray(warp_two_pass(img, coords, max_disp=8))
    assert np.allclose(out[8:-8, 8:-8], ref[8:-8, 8:-8], atol=1e-5)


def test_two_pass_smooth_field_close():
    import jax.numpy as jnp

    from darsia_tpu.ops.pallas.warp2pass import warp_two_pass
    from darsia_tpu.ops.warp import warp

    rng = np.random.default_rng(1)
    # Smooth image (so the Catmull-Smith positional error stays small).
    from darsia_tpu.restoration.averaging import uniform_filter

    base = np.asarray(uniform_filter(jnp.asarray(rng.random((128, 192))), 9))
    img = jnp.asarray(np.stack([base] * 3, axis=-1), dtype=jnp.float32)
    yy, xx = np.meshgrid(np.arange(128), np.arange(192), indexing="ij")
    coords = jnp.asarray(
        np.stack(
            [yy + 4 * np.sin(xx / 40.0), xx + 3 * np.cos(yy / 37.0)]
        ),
        dtype=jnp.float32,
    )
    ref = np.asarray(warp(img, coords, order=1, mode="nearest"))
    out = np.asarray(warp_two_pass(img, coords, max_disp=8))
    err = np.abs(out - ref)[8:-8, 8:-8]
    assert err.mean() < 5e-3


def test_two_pass_shape_changing_crop():
    import jax.numpy as jnp

    from darsia_tpu.ops.pallas.warp2pass import warp_two_pass
    from darsia_tpu.ops.warp import identity_grid

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((64, 96, 3)), dtype=jnp.float32)
    # Crop rows 8..56, cols 16..80 (axis-aligned -> exact).
    out_shape = (48, 64)
    grid = identity_grid(out_shape) + jnp.array([8.0, 16.0])[:, None, None]
    out = np.asarray(warp_two_pass(img, grid, max_disp=32))
    assert out.shape == (48, 64, 3)
    assert np.allclose(out, np.asarray(img)[8:56, 16:80], atol=1e-5)


@pytest.mark.parametrize("max_disp", [1, 4, 16, 64, 120])
def test_two_pass_equivalence_across_displacement_bounds(max_disp):
    """Pallas two-pass warp == XLA-gather warp for uniform shifts up to
    (and at) the declared displacement bound."""
    import jax.numpy as jnp

    from darsia_tpu.ops.pallas.warp2pass import warp_two_pass
    from darsia_tpu.ops.warp import identity_grid, warp

    rng = np.random.default_rng(max_disp)
    H, W = 160, 256
    img = jnp.asarray(rng.random((H, W, 3)), dtype=jnp.float32)
    # Displacement exactly at the bound (sign-mixed, fractional).
    dy = max_disp - 0.75
    dx = -(max_disp - 0.25)
    coords = identity_grid((H, W)) + jnp.array([dy, dx])[:, None, None]
    ref = np.asarray(warp(img, coords, order=1, mode="nearest"))
    out = np.asarray(warp_two_pass(img, coords, max_disp=max_disp))
    pad = min(max_disp + 1, H // 4)
    np.testing.assert_allclose(
        out[pad:-pad, pad:-pad], ref[pad:-pad, pad:-pad], atol=1e-4
    )


def test_two_pass_smooth_random_field_vs_xla_gather():
    """Smoothed random displacement field (the production regime —
    curvature/registration fields are smooth by construction): two-pass
    must track the XLA gather warp closely.  For *rough* (white-noise)
    fields the separable row/column split is only correlated, not
    equivalent — that is the documented contract of the kernel."""
    import jax.numpy as jnp

    from darsia_tpu.ops.pallas.warp2pass import warp_two_pass
    from darsia_tpu.ops.warp import identity_grid, warp
    from darsia_tpu.restoration.averaging import uniform_filter

    rng = np.random.default_rng(77)
    H, W = 96, 128
    img = jnp.asarray(rng.random((H, W, 3)), dtype=jnp.float32)
    noise = rng.uniform(-3, 3, (2, H, W)).astype(np.float32)
    disp = jnp.stack(
        [uniform_filter(jnp.asarray(noise[k]), 15) for k in range(2)]
    )
    coords = identity_grid((H, W)) + disp
    ref = np.asarray(warp(img, coords, order=1, mode="nearest"))
    out = np.asarray(warp_two_pass(img, coords, max_disp=4))
    err = np.abs(out - ref)[6:-6, 6:-6]
    assert err.mean() < 0.02
    # Rough white-noise field: outside the kernel's contract (separable
    # row/column resampling diverges from true 2d interpolation there) —
    # but the output must stay finite and bounded by the input range
    # (convexity of the per-pass linear interpolation).
    rough = identity_grid((H, W)) + jnp.asarray(noise)
    out_r = np.asarray(warp_two_pass(img, rough, max_disp=4))
    assert np.isfinite(out_r).all()
    assert out_r.min() >= -1e-5 and out_r.max() <= 1.0 + 1e-5


def test_planar_variant_matches_channels_last():
    """warp_two_pass_planar == warp_two_pass up to layout."""
    import jax.numpy as jnp

    from darsia_tpu.ops.pallas.warp2pass import (
        warp_two_pass,
        warp_two_pass_planar,
    )
    from darsia_tpu.ops.warp import identity_grid

    rng = np.random.default_rng(17)
    H, W = 64, 96
    img = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    grid = identity_grid((H, W)) + jnp.asarray(
        2.0 * np.sin(np.arange(H * W).reshape(1, H, W) / 53.0), jnp.float32
    )
    hwc = np.asarray(warp_two_pass(img, grid, 4))
    chw = np.asarray(
        warp_two_pass_planar(jnp.moveaxis(img, -1, 0), grid, 4)
    )
    assert np.allclose(hwc, np.moveaxis(chw, 0, -1), atol=1e-6)


def test_row_warp_schedules_bitwise_equal():
    """ring / transposed-3D schedules == the reference schedule, bitwise.

    All three run the identical gather math (same ops, same order); the
    variants only change the pipeline schedule, so equality is exact —
    verified bitwise on the real TPU at production 4K scale too (see
    docs/roofline.md lever 2).
    """
    import jax.numpy as jnp

    from darsia_tpu.ops.pallas.warp2pass import (
        warp_rows_pallas,
        warp_rows_pallas_t,
    )

    rng = np.random.default_rng(7)
    for R, W, D in [(64, 300, 7), (130, 515, 40), (96, 257, 121)]:
        data = rng.standard_normal((3, R, W)).astype(np.float32)
        jj = np.broadcast_to(np.arange(W, dtype=np.float32), (R, W))
        cols = jnp.asarray((jj + rng.uniform(-D, D, (R, W))).astype(np.float32))
        ref = np.stack(
            [
                np.asarray(warp_rows_pallas(jnp.asarray(d), cols, D, ring=False))
                for d in data
            ]
        )
        ring = np.stack(
            [
                np.asarray(warp_rows_pallas(jnp.asarray(d), cols, D, ring=True))
                for d in data
            ]
        )
        t_out = np.asarray(warp_rows_pallas_t(jnp.asarray(data), cols, D))
        assert np.array_equal(ref, ring)
        assert np.array_equal(ref, np.swapaxes(t_out, 1, 2))
