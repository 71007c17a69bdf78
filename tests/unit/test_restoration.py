"""Restoration & solver tests: stencil solvers against analytic solutions,
TVD energy decrease, H1 smoothing, morphology."""

import numpy as np
import pytest

import darsia_tpu as da


def _random_spd_problem(shape=(32, 32), seed=0):
    rng = np.random.default_rng(seed)
    x_true = rng.random(shape).astype(np.float32)
    mass, diff = 1.0, 0.5
    # rhs = mass*x - diff*laplace(x)
    import jax.numpy as jnp

    rhs = np.asarray(
        mass * jnp.asarray(x_true)
        - da.fv_laplace(jnp.asarray(x_true), dim=2, diffusion_coeff=diff)
    )
    return x_true, rhs, mass, diff


def test_derivatives_conventions():
    import jax.numpy as jnp

    x = jnp.asarray(np.arange(5, dtype=np.float32)[:, None] * np.ones((1, 3)))
    bd = np.asarray(da.backward_diff(x, axis=0))
    assert np.allclose(bd[:-1], 1.0)
    assert np.allclose(bd[-1], 0.0)
    fd = np.asarray(da.forward_diff(x, axis=0))
    assert np.allclose(fd[1:], 1.0)
    assert np.allclose(fd[0], 0.0)


def test_cg_solver_converges():
    x_true, rhs, mass, diff = _random_spd_problem()
    solver = da.CG(maxiter=500, tol=1e-10, mass_coeff=mass, diffusion_coeff=diff)
    x = np.asarray(solver(np.zeros_like(x_true), rhs))
    assert np.allclose(x, x_true, atol=1e-4)


def test_jacobi_reduces_residual():
    import jax.numpy as jnp

    x_true, rhs, mass, diff = _random_spd_problem()
    solver = da.Jacobi(maxiter=200, mass_coeff=mass, diffusion_coeff=diff)
    x = np.asarray(solver(np.zeros_like(x_true), rhs))
    res0 = np.linalg.norm(rhs)
    res = np.linalg.norm(
        rhs
        - np.asarray(
            mass * jnp.asarray(x)
            - da.fv_laplace(jnp.asarray(x), dim=2, diffusion_coeff=diff)
        )
    )
    assert res < 0.05 * res0


def test_mg_solver_converges():
    x_true, rhs, mass, diff = _random_spd_problem(shape=(64, 64))
    solver = da.MG(
        depth=3, maxiter=50, tol=1e-10, mass_coeff=mass, diffusion_coeff=diff
    )
    x = np.asarray(solver(np.zeros_like(x_true), rhs))
    assert np.allclose(x, x_true, atol=1e-3)


def test_mg_heterogeneous_coefficients():
    rng = np.random.default_rng(1)
    shape = (32, 32)
    x_true = rng.random(shape).astype(np.float32)
    diff = (0.1 + rng.random(shape)).astype(np.float32)
    import jax.numpy as jnp

    rhs = np.asarray(
        jnp.asarray(x_true)
        - da.fv_laplace(jnp.asarray(x_true), dim=2, diffusion_coeff=jnp.asarray(diff))
    )
    solver = da.MG(depth=2, maxiter=100, tol=1e-12, mass_coeff=1.0, diffusion_coeff=diff)
    x = np.asarray(solver(np.zeros_like(x_true), rhs))
    assert np.allclose(x, x_true, atol=5e-3)


def _tv_energy(x, img, mu):
    import jax.numpy as jnp

    x = jnp.asarray(x)
    grad = sum(
        float(jnp.sum(jnp.abs(da.backward_diff(x, j, 2)))) for j in range(2)
    )
    return 0.5 * float(jnp.sum((x - jnp.asarray(img)) ** 2)) + mu * grad


def test_split_bregman_tvd_denoises():
    rng = np.random.default_rng(2)
    clean = np.zeros((40, 40), dtype=np.float32)
    clean[10:30, 10:30] = 1.0
    noisy = clean + 0.1 * rng.standard_normal((40, 40)).astype(np.float32)
    denoised = np.asarray(
        da.split_bregman_tvd(noisy, mu=0.1, max_num_iter=50, solver=da.Jacobi(maxiter=20))
    )
    assert _tv_energy(denoised, noisy, 0.1) < _tv_energy(noisy, noisy, 0.1)
    # Noise suppressed in flat regions.
    assert denoised[2:8, 2:8].std() < noisy[2:8, 2:8].std() * 0.6


def test_split_bregman_isotropic_and_eps():
    rng = np.random.default_rng(3)
    noisy = rng.random((24, 24)).astype(np.float32)
    out = np.asarray(
        da.split_bregman_tvd(
            noisy, mu=0.2, max_num_iter=100, eps=1e-4, isotropic=True
        )
    )
    assert out.shape == noisy.shape
    assert np.isfinite(out).all()


def test_tvd_chambolle():
    rng = np.random.default_rng(4)
    clean = np.zeros((40, 40), dtype=np.float32)
    clean[:, 20:] = 1.0
    noisy = clean + 0.1 * rng.standard_normal((40, 40)).astype(np.float32)
    denoiser = da.TVD(method="chambolle", weight=0.1)
    out = np.asarray(denoiser(noisy))
    assert out[5:15, 5:15].std() < noisy[5:15, 5:15].std() * 0.6
    # Edge preserved.
    assert abs(out[:, 25:].mean() - out[:, :15].mean()) > 0.7


def test_tvd_on_image():
    rng = np.random.default_rng(5)
    img = da.ScalarImage(rng.random((20, 20)).astype(np.float32), dimensions=[1, 1])
    out = da.TVD(method="heterogeneous bregman", weight=0.1, max_num_iter=20)(img)
    assert isinstance(out, da.ScalarImage)
    assert out.shape == img.shape


def test_h1_regularization():
    rng = np.random.default_rng(6)
    noisy = rng.random((30, 30)).astype(np.float32)
    out = np.asarray(
        da.H1_regularization(noisy, mu=5.0, omega=1.0, solver=da.CG(maxiter=200, tol=1e-8))
    )
    assert out.std() < noisy.std() * 0.7
    # Mean roughly preserved by Neumann BCs.
    assert abs(out.mean() - noisy.mean()) < 0.05


def test_median_filter():
    img = np.zeros((15, 15), dtype=np.float32)
    img[7, 7] = 10.0  # salt noise
    out = np.asarray(da.median_filter(img, disk_radius=1))
    assert out[7, 7] == 0.0


def test_morphology_small_objects_and_holes():
    mask = np.zeros((30, 30), dtype=bool)
    mask[5:15, 5:15] = True
    mask[20, 20] = True  # small object
    mask[8, 8] = False  # small hole
    cleaned = da.morphology.remove_small_objects(mask, min_size=4)
    assert not cleaned[20, 20]
    filled = da.morphology.remove_small_holes(cleaned, area_threshold=4)
    assert filled[8, 8]


def test_convex_cover():
    mask = np.zeros((20, 20), dtype=bool)
    mask[2, 2] = mask[2, 12] = mask[12, 2] = mask[12, 12] = True
    cover = da.BinaryLocalConvexCover(cover_patch_size=20)(mask)
    assert cover[7, 7]  # interior covered by hull


def test_volume_averaging():
    rng = np.random.default_rng(7)
    img = da.ScalarImage(rng.random((40, 40)).astype(np.float32), dimensions=[1.0, 1.0])
    mask = da.ScalarImage(np.ones((40, 40), dtype=np.float32), dimensions=[1.0, 1.0])
    averaged = da.volume_average(img, mask, size=0.2)
    out = np.asarray(averaged.img)
    assert out.std() < np.asarray(img.img).std() * 0.5


def test_anderson_acceleration():
    # Fixed point: g(x) = 0.5 x + 1, solution x = 2.
    aa = da.AndersonAcceleration(dimension=3, depth=3)
    x = np.zeros(3)
    for i in range(15):
        g = 0.5 * x + 1
        x = aa(g, g - x, i)
    assert np.allclose(x, 2.0, atol=1e-8)


# ---- fv_laplace operator contract (the solver-stack operator) ------------


def _mirror_neumann_lap(x):
    xp = np.pad(x, 1, mode="edge")
    return xp[:-2, 1:-1] + xp[2:, 1:-1] + xp[1:-1, :-2] + xp[1:-1, 2:] - 4 * x


def test_fv_laplace_constant_equals_mirror_neumann():
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    x = rng.standard_normal((9, 13))
    out = np.asarray(da.fv_laplace(jnp.asarray(x), dim=2))
    assert np.allclose(out, _mirror_neumann_lap(x), atol=1e-12)


def test_fv_laplace_3d_zero_flux():
    # Constants are in the nullspace (pure Neumann), any dim.
    import jax.numpy as jnp

    x = jnp.full((4, 5, 6), 3.7)
    out = np.asarray(da.fv_laplace(x, dim=3))
    assert np.allclose(out, 0.0, atol=1e-12)
    # And the operator conserves mass: sum(div flux) = 0 for any field.
    rng = np.random.default_rng(12)
    y = jnp.asarray(rng.standard_normal((4, 5, 6)))
    assert abs(float(jnp.sum(da.fv_laplace(y, dim=3)))) < 1e-4  # f32


def test_fv_laplace_heterogeneous_symmetric():
    """Face-averaged heterogeneous div(D grad) is symmetric: <Ax,y>=<x,Ay>."""
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    D = jnp.asarray(0.1 + rng.random((8, 10)))
    x = jnp.asarray(rng.standard_normal((8, 10)))
    y = jnp.asarray(rng.standard_normal((8, 10)))
    Ax = da.fv_laplace(x, dim=2, diffusion_coeff=D)
    Ay = da.fv_laplace(y, dim=2, diffusion_coeff=D)
    assert np.isclose(float(jnp.vdot(Ax, y)), float(jnp.vdot(x, Ay)), rtol=1e-5)


def test_fv_laplace_is_adjoint_of_difference_gradient():
    """fv_laplace == -G^T G for the one-sided difference gradient used by
    split-Bregman shrinkage: the inner solve is variationally consistent."""
    import jax.numpy as jnp

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((7, 9)))
    y = jnp.asarray(rng.standard_normal((7, 9)))
    # <G x, G y> must equal <-fv_laplace(x), y>.
    gxgy = 0.0
    for ax in range(2):
        gx = jnp.diff(x, axis=ax)
        gy = jnp.diff(y, axis=ax)
        gxgy += float(jnp.vdot(gx, gy))
    lhs = float(jnp.vdot(-da.fv_laplace(x, dim=2), y))
    assert np.isclose(gxgy, lhs, rtol=1e-5)


def test_solver_family_cross_consistency():
    """Jacobi, CG and MG converge to the same solution of the same system."""
    x_true, rhs, mass, diff = _random_spd_problem(shape=(33, 31), seed=5)
    sols = []
    for solver in (
        da.Jacobi(maxiter=4000, mass_coeff=mass, diffusion_coeff=diff),
        da.CG(maxiter=400, tol=1e-12, mass_coeff=mass, diffusion_coeff=diff),
        da.MG(maxiter=60, tol=1e-12, mass_coeff=mass, diffusion_coeff=diff),
    ):
        sols.append(np.asarray(solver(np.zeros_like(x_true), rhs)))
    assert np.allclose(sols[0], sols[1], atol=5e-4)
    assert np.allclose(sols[1], sols[2], atol=5e-4)
    assert np.allclose(sols[1], x_true, atol=5e-4)
