"""Tests for utility layers: arithmetics, ROI, masks, segmentation,
detection, features, linalg."""

import numpy as np
import pytest

import darsia_tpu as da


def test_weight_scalar_and_image():
    img = da.ScalarImage(np.ones((8, 8), np.float32), dimensions=[1, 1])
    out = da.weight(img, 2.5)
    assert np.allclose(out.as_numpy(), 2.5)
    w = da.ScalarImage(np.full((8, 8), 0.5, np.float32), dimensions=[1, 1])
    out2 = da.weight(img, w)
    assert np.allclose(out2.as_numpy(), 0.5)


def test_stack_and_superpose():
    a = da.ScalarImage(np.ones((8, 8), np.float32), dimensions=[1, 1])
    b = da.ScalarImage(2 * np.ones((8, 8), np.float32), dimensions=[1, 1])
    series = da.stack([a, b])
    assert series.series and series.time_num == 2
    total = da.superpose([a, b])
    assert np.allclose(total.as_numpy(), 3.0, atol=1e-5)


def test_roi_polygon():
    roi = da.ROI([np.array([0.0, 0.0]), np.array([1.0, 0.0]), np.array([1.0, 1.0]), np.array([0.0, 1.0])])
    assert roi.contains((0.5, 0.5))
    assert not roi.contains((1.5, 0.5))
    img = da.ScalarImage(np.ones((10, 10), np.float32), width=2.0, height=2.0)
    sub = roi.extract_subregion(img)
    assert sub.shape == (5, 5)
    mask = roi.mask(img)
    assert mask.shape == (10, 10)
    assert mask[7, 2]  # y=0.5 region is near the bottom rows
    assert not mask[2, 7]


def test_masks_iterator():
    labels = da.ScalarImage(
        np.array([[0, 0, 1], [2, 2, 1], [2, 2, 1]]), dimensions=[1, 1]
    )
    masks = da.Masks(labels)
    assert masks.size == 3
    collected = [np.asarray(m.img).sum() for m in masks]
    assert sorted(collected) == [2, 3, 4]


def test_sort_quad():
    pts = np.array([[10, 10], [0, 10], [0, 0], [10, 0]])
    sorted_pts = da.sort_quad(pts)
    assert np.array_equal(
        sorted_pts, np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    )


def test_detection():
    img = da.ScalarImage(np.eye(5, dtype=np.float32), dimensions=[1, 1])
    voxels = da.detect_value(img, 1.0, tolerance=0.1)
    assert len(voxels) == 5
    closest = da.detect_closest_point(voxels, da.make_voxel([1, 2]))
    assert np.array_equal(np.asarray(closest), [1, 1]) or np.array_equal(
        np.asarray(closest), [2, 2]
    )


def test_segment_watershed_two_layers():
    # Two horizontal layers with distinct intensities.
    img = np.zeros((60, 80), dtype=np.float32)
    img[:30] = 0.2
    img[30:] = 0.8
    labels = da.segment(
        img, method="median", **{"median disk radius": 3, "cleanup": True}
    )
    labels = np.asarray(labels)
    # Two dominant labels split along the middle.
    top = np.bincount(labels[:25].ravel()).argmax()
    bottom = np.bincount(labels[35:].ravel()).argmax()
    assert top != bottom


def test_label_image_from_sketch():
    sketch = np.zeros((20, 20, 3), dtype=np.float32)
    sketch[:10] = [1.0, 0.0, 0.0]
    sketch[10:] = [0.0, 0.0, 1.0]
    labels = da.label_image(sketch)
    assert len(np.unique(labels)) == 2


def test_group_and_reassign_labels():
    labels = np.array([[0, 1], [2, 3]])
    grouped = da.group_labels(labels, [[1, 3]])
    assert len(np.unique(grouped)) == 3
    remapped = da.reassign_labels(labels, {3: 0})
    assert remapped[1, 1] == 0


def test_feature_detection_translation():
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    from darsia_tpu.restoration.averaging import uniform_filter

    base = np.asarray(uniform_filter(jnp.asarray(rng.random((64, 64))), 5))
    shifted = np.roll(base, (3, 4), axis=(0, 1))
    fd = da.FeatureDetection()
    pts_src, pts_dst, ok = fd.find_matches(base, shifted)
    assert ok and len(pts_src) > 0
    disp = (pts_dst - pts_src).mean(axis=0)
    assert np.allclose(disp, [3, 4], atol=0.5)


def test_ksp_wrapper():
    import scipy.sparse as sps

    n = 20
    A = sps.diags([2.0] * n) + sps.eye(n, k=1) * -0.5 + sps.eye(n, k=-1) * -0.5
    b = np.ones(n)
    ksp = da.KSP(A)
    ksp.setup({"ksp_type": "cg", "ksp_rtol": 1e-10})
    x = ksp.solve(b)
    assert np.allclose(A @ x, b, atol=1e-6)
    ksp2 = da.KSP(A)
    ksp2.setup({"ksp_type": "preonly"})
    assert np.allclose(A @ ksp2.solve(b), b, atol=1e-8)


def test_coordinate_transformation():
    rng = np.random.default_rng(1)
    arr = rng.random((20, 30)).astype(np.float32)
    src = da.ScalarImage(arr, width=3.0, height=2.0)
    dst = da.ScalarImage(np.zeros((20, 30), np.float32), width=3.0, height=2.0)
    # Identity transformation via matching points.
    pts = da.make_coordinate([[0.0, 0.0], [3.0, 0.0], [0.0, 2.0], [3.0, 2.0]])
    trafo = da.CoordinateTransformation(
        src.coordinatesystem, dst.coordinatesystem, pts, pts
    )
    out = trafo(src)
    assert out.shape[0] > 15 and out.shape[1] > 25
