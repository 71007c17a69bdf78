"""Registration tests: patches, translation analysis, image registration."""

import numpy as np
import pytest

import darsia_tpu as da


def _textured_image(seed=0, shape=(96, 128)):
    rng = np.random.default_rng(seed)
    # Smooth random texture with features (sum of random Gaussians).
    arr = rng.random(shape).astype(np.float32)
    import jax.numpy as jnp
    from darsia_tpu.restoration.averaging import uniform_filter

    smooth = np.asarray(uniform_filter(jnp.asarray(arr), 7))
    return (smooth - smooth.min()) / (smooth.max() - smooth.min())


def test_patches_geometry():
    img = da.ScalarImage(np.zeros((40, 60), np.float32), width=3.0, height=2.0)
    patches = da.Patches(img, [4, 6], rel_overlap=0.1)
    assert patches.num_patches == [4, 6]
    p00 = patches(0, 0)
    assert p00.shape[0] >= 10 and p00.shape[1] >= 10
    centers = patches.centers_voxels
    assert centers.shape == (4, 6, 2)
    # Center of first patch near (5, 5).
    assert abs(centers[0, 0, 0] - 5) <= 1 and abs(centers[0, 0, 1] - 5) <= 1


def test_patches_assemble_roundtrip():
    rng = np.random.default_rng(1)
    data = rng.random((40, 60)).astype(np.float32)
    img = da.ScalarImage(data, width=3.0, height=2.0)
    patches = da.Patches(img, [4, 6], rel_overlap=0.2)
    assembled = patches.assemble()
    assert np.allclose(assembled.as_numpy(), data, atol=1e-6)
    blended = patches.blend_and_assemble()
    assert np.allclose(blended.as_numpy(), data, atol=1e-5)


def test_translation_analysis_uniform_shift():
    base_arr = _textured_image(0)
    shifted_arr = np.roll(base_arr, shift=(3, 5), axis=(0, 1))
    base = da.ScalarImage(base_arr, width=1.0, height=1.0)
    img = da.ScalarImage(shifted_arr, width=1.0, height=1.0)

    analysis = da.TranslationAnalysis(
        base, N_patches=[3, 4], rel_overlap=0.3, quality_tol=0.01
    )
    analysis.load_image(img)
    translation, success = analysis.find_translation()
    assert success
    # The correction displacement (img -> base) is the negative shift.
    disp = translation(np.array([[64.0, 48.0]]))
    assert abs(float(np.asarray(disp[0]).ravel()[0]) + 5) < 1.0
    assert abs(float(np.asarray(disp[1]).ravel()[0]) + 3) < 1.0

    aligned = analysis.translate_image()
    # Interior should match base after alignment (tolerance accounts for the
    # zero-displacement boundary conditions blending into the field).
    a = aligned.as_numpy()[24:-24, 32:-32]
    b = base_arr[24:-24, 32:-32]
    assert np.abs(a - b).mean() < 0.05
    assert np.abs(a - b).mean() < np.abs(
        shifted_arr[24:-24, 32:-32] - b
    ).mean() * 0.5


def test_image_registration_facade():
    base_arr = _textured_image(2)
    shifted_arr = np.roll(base_arr, shift=(2, -4), axis=(0, 1))
    base = da.ScalarImage(base_arr, width=1.0, height=1.0)
    img = da.ScalarImage(shifted_arr, width=1.0, height=1.0)

    registration = da.ImageRegistration(
        base, N_patches=[3, 3], rel_overlap=0.3, quality_tol=0.01
    )
    aligned = registration(img)
    a = aligned.as_numpy()[24:-24, 32:-32]
    b = base_arr[24:-24, 32:-32]
    assert np.abs(a - b).mean() < 0.05
    assert np.abs(a - b).mean() < np.abs(
        shifted_arr[24:-24, 32:-32] - b
    ).mean() * 0.5

    # Displacement field and evaluation.
    field = registration.displacement()
    assert field.shape == (2, 96, 128)
    disp = registration.evaluate(np.array([[64.0, 48.0]]), units="pixel")
    assert abs(disp[0, 0] - 4) < 1.0  # correction dx = +4 for shift dx = -4

    # apply() warps other images identically.
    other = da.ScalarImage(shifted_arr.copy(), width=1.0, height=1.0)
    applied = registration.apply(other)
    assert np.abs(
        applied.as_numpy()[24:-24, 32:-32] - base_arr[24:-24, 32:-32]
    ).mean() < 0.05


def test_piecewise_perspective_transform():
    base_arr = _textured_image(3, shape=(64, 64))
    img = da.ScalarImage(base_arr, width=1.0, height=1.0)
    patches = da.Patches(img, [2, 2], rel_overlap=0.2)
    displacement = np.tile(np.array([3.0, 2.0]), (2, 2, 1))  # uniform (dx, dy)
    transform = da.PiecewisePerspectiveTransform()
    warped = transform.find_and_warp(patches, displacement)
    expected = np.roll(base_arr, shift=(2, 3), axis=(0, 1))
    assert np.abs(
        warped.as_numpy()[8:-8, 8:-8] - expected[8:-8, 8:-8]
    ).mean() < 0.03


def test_deformation_correction():
    base_arr = _textured_image(4)
    shifted = np.roll(base_arr, shift=(0, 3), axis=(0, 1))
    base = da.ScalarImage(base_arr, width=1.0, height=1.0)
    corr = da.DeformationCorrection(
        base, config={"N_patches": [2, 3], "rel_overlap": 0.3, "quality_tol": 0.01}
    )
    out = np.asarray(corr.correct_array(shifted))
    assert np.abs(out[16:-16, 16:-16] - base_arr[16:-16, 16:-16]).mean() < 0.02


def test_displacement_field_coarse_matches_dense():
    """The >1 Mpix coarse-TPS fast path must match dense evaluation.

    Production images take the 1/16-grid + bilinear-upsample lane of
    TranslationAnalysis.displacement_field; this pins it against the exact
    dense evaluation on a synthetic smooth displacement.
    """
    base = da.ScalarImage(
        np.zeros((192, 256), np.float32), width=1.0, height=1.0
    )
    analysis = da.TranslationAnalysis(base, N_patches=[2, 2], rel_overlap=0.1)
    # Smooth synthetic displacement samples on a patch-like grid.
    gy, gx = np.meshgrid(
        np.linspace(10, 180, 5), np.linspace(10, 246, 7), indexing="ij"
    )
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)  # (x, y)
    vals_x = 3.0 * np.sin(gx.ravel() / 80.0)
    vals_y = 2.0 * np.cos(gy.ravel() / 60.0)
    analysis._displacement_data = (pts, vals_x, pts, vals_y)

    dense = np.asarray(analysis.displacement_field((192, 256)))
    analysis.COARSE_THRESHOLD = 0  # force the coarse lane (instance override)
    coarse = np.asarray(analysis.displacement_field((192, 256)))
    assert coarse.shape == dense.shape == (2, 192, 256)
    scale = np.abs(dense).max()
    assert np.abs(coarse - dense).mean() < 0.02 * scale
    assert np.abs(coarse - dense).max() < 0.2 * scale


def test_fused_aligner_matches_flexible_path():
    """fused_align (one jitted program) must agree with the flexible
    find_translation + translate_image path when all patches pass."""
    base_arr = _textured_image(5)
    shifted_arr = np.roll(base_arr, shift=(3, -4), axis=(0, 1))
    base = da.ScalarImage(base_arr, width=1.0, height=1.0)
    img = da.ScalarImage(shifted_arr, width=1.0, height=1.0)

    flexible = da.TranslationAnalysis(
        base, N_patches=[3, 4], rel_overlap=0.3, quality_tol=0.01
    )
    aligned_flex = flexible(img)

    fused = da.TranslationAnalysis(
        base, N_patches=[3, 4], rel_overlap=0.3, quality_tol=0.01
    )
    aligned_fused = fused.fused_align(img)

    a = aligned_fused.as_numpy()[24:-24, 32:-32]
    b = aligned_flex.as_numpy()[24:-24, 32:-32]
    assert np.abs(a - b).mean() < 0.02
    # Both recover the shift: interior close to base.
    assert np.abs(a - base_arr[24:-24, 32:-32]).mean() < 0.05
    # fused_align materializes the same state as find_translation.
    assert fused.have_translation.any()
    disp = fused.translation(np.array([[64.0, 48.0]]))
    # Correction displacement is the negative shift: dx = -(-4) = +4.
    assert abs(float(np.asarray(disp[0]).ravel()[0]) - 4) < 1.5
    # Registration facade routes through the fused lane.
    reg = da.ImageRegistration(
        base, N_patches=[3, 4], rel_overlap=0.3, quality_tol=0.01, fused=True
    )
    aligned_facade = reg(img)
    assert np.abs(
        aligned_facade.as_numpy()[24:-24, 32:-32] - a
    ).mean() < 1e-5
