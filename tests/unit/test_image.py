"""Image core tests: metadata, coordinate system, slicing, arithmetic.

Mirrors reference test strategy (tests/unit/test_image.py): tiny synthetic
arrays, metadata round trips, analytic coordinate checks.
"""

import numpy as np
import pytest

import darsia_tpu as da


@pytest.fixture
def optical():
    rng = np.random.default_rng(42)
    arr = rng.random((20, 40, 3)).astype(np.float32)
    return da.OpticalImage(arr, width=2.0, height=1.0)


def test_metadata_roundtrip(optical):
    meta = optical.metadata()
    clone = da.OpticalImage(optical.as_numpy(), **meta)
    assert clone.dimensions == optical.dimensions
    assert np.allclose(np.asarray(clone.origin), np.asarray(optical.origin))
    assert clone.shape == optical.shape


def test_default_origin(optical):
    # 2d: origin at (x=0, y=height) — top-left voxel.
    assert np.allclose(np.asarray(optical.origin), [0.0, 1.0])


def test_voxel_size(optical):
    assert np.allclose(optical.voxel_size, [1.0 / 20, 2.0 / 40])


def test_coordinatesystem_roundtrip(optical):
    cs = optical.coordinatesystem
    voxel = np.array([5, 10])
    coord = cs.coordinate(voxel)
    # x = 10 * 0.05 = 0.5 ; y = 1.0 - 5 * 0.05 = 0.75
    assert np.allclose(np.asarray(coord), [0.5, 0.75])
    back = cs.voxel(coord)
    assert np.all(np.asarray(back) == voxel)


def test_functional_coordinate_maps(optical):
    import jax.numpy as jnp

    from darsia_tpu import coordinates_to_voxels, voxels_to_coordinates

    voxels = jnp.array([[5.0, 10.0], [0.0, 0.0]])
    origin = jnp.array([0.0, 1.0])
    voxel_size = jnp.array([0.05, 0.05])  # per Cartesian axis x, y
    coords = voxels_to_coordinates(voxels, origin, voxel_size, "ij")
    assert np.allclose(np.asarray(coords), [[0.5, 0.75], [0.0, 1.0]])
    back = coordinates_to_voxels(coords, origin, voxel_size, "ij")
    assert np.allclose(np.asarray(back), [[5, 10], [0, 0]])


def test_subregion_coordinates(optical):
    roi = da.make_coordinate([[0.5, 0.0], [1.5, 0.75]])
    sub = optical.subregion(roi)
    # x range [0.5, 1.5] -> cols 10..30; y range [0, 0.75] -> rows 5..20
    assert sub.shape[:2] == (15, 20)
    assert np.allclose(sub.dimensions, [0.75, 1.0])


def test_subregion_slices(optical):
    sub = optical.subregion((slice(0, 10), slice(0, 20)))
    assert sub.shape[:2] == (10, 20)
    assert np.allclose(sub.dimensions, [0.5, 1.0])
    # Origin voxel unchanged -> same origin coordinate.
    assert np.allclose(np.asarray(sub.origin), [0.0, 1.0])


def test_arithmetic(optical):
    doubled = optical + optical
    assert np.allclose(doubled.as_numpy(), 2 * optical.as_numpy())
    scaled = 0.5 * optical
    assert np.allclose(scaled.as_numpy(), 0.5 * optical.as_numpy())
    diff = optical - optical
    assert np.allclose(diff.as_numpy(), 0)


def test_time_series_slicing():
    arr = np.random.default_rng(0).random((8, 8, 3, 3))  # space x time x rgb
    img = da.Image(arr, series=True, time=[0.0, 1.0, 2.0], dimensions=[1, 1])
    assert img.time_num == 3
    sliced = img.time_slice(1)
    assert not sliced.series
    assert sliced.time == 1.0
    assert sliced.shape == (8, 8, 3)
    interval = img.time_interval(slice(0, 2))
    assert interval.time_num == 2


def test_scalar_image_write(tmp_path):
    arr = np.linspace(0, 1, 64).reshape(8, 8).astype(np.float32)
    img = da.ScalarImage(arr, dimensions=[1, 1])
    img.write(tmp_path / "out.png")
    assert (tmp_path / "out.png").exists()
    img.write(tmp_path / "out.npy")
    assert np.allclose(np.load(tmp_path / "out.npy"), arr)


def test_save_load_npz(tmp_path):
    arr = np.random.default_rng(1).random((6, 9, 3)).astype(np.float32)
    img = da.OpticalImage(arr, width=3.0, height=2.0)
    img.save(tmp_path / "img")
    loaded = da.imread(tmp_path / "img.npz")
    assert isinstance(loaded, da.OpticalImage)
    assert np.allclose(loaded.as_numpy(), arr)
    assert np.allclose(loaded.dimensions, [2.0, 3.0])


def test_image_pytree():
    import jax

    arr = np.ones((4, 4, 3), dtype=np.float32)
    img = da.OpticalImage(arr, width=1.0, height=1.0)
    leaves, treedef = jax.tree_util.tree_flatten(img)
    assert len(leaves) == 1
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(rebuilt, da.OpticalImage)
    assert rebuilt.dimensions == img.dimensions


def test_monochromatic(optical):
    gray = optical.to_monochromatic("gray")
    assert isinstance(gray, da.ScalarImage)
    assert gray.shape == (20, 40)
    red = optical.to_monochromatic("red")
    assert np.allclose(red.as_numpy(), optical.as_numpy()[..., 0])


def test_reduce_axis_3d():
    arr = np.random.default_rng(3).random((4, 6, 8))
    img = da.Image(arr, space_dim=3, dimensions=[1.0, 2.0, 3.0], scalar=True)
    reduced = da.reduce_axis(img, "z", mode="average")
    assert reduced.space_dim == 2
    assert reduced.shape == (6, 8)
    assert np.allclose(reduced.as_numpy(), arr.mean(axis=0), atol=1e-6)
