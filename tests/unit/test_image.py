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


def test_show_plotly_figures_and_gating():
    """show_plotly builds reference-shaped figures (image.py:1443) and is
    capability-gated on plotly."""

    class FakeFig:
        def __init__(self, **kw):
            self.kw = kw

    class FakePX:
        @staticmethod
        def imshow(arr, **kw):
            return FakeFig(arr=arr, **kw)

    class FakeGO:
        class Scatter3d:
            def __init__(self, **kw):
                self.kw = kw

        class Volume:
            def __init__(self, **kw):
                self.kw = kw

        class Figure:
            def __init__(self, data=None):
                self.data = data

    img = da.ScalarImage(
        np.random.default_rng(0).random((8, 12)), width=1.2, height=0.8
    )
    figs = img._plotly_figures(FakePX, FakeGO, title="t")
    assert len(figs) == 1
    assert figs[0].kw["x"].shape == (12,) and figs[0].kw["y"].shape == (8,)

    vol = da.ScalarImage(
        np.random.default_rng(1).random((6, 6, 6)), dimensions=[1, 1, 1], dim=3
    )
    figs3 = vol._plotly_figures(FakePX, FakeGO, threshold=0.5)
    assert len(figs3) == 1 and isinstance(figs3[0].data, FakeGO.Scatter3d)
    figs3v = vol._plotly_figures(FakePX, FakeGO, view="voxel", threshold=0.5)
    assert isinstance(figs3v[0].data, FakeGO.Volume)

    try:
        import plotly  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="plotly"):
            img.show_plotly()


def test_dtype_fidelity_contract():
    """uint8/uint16 <-> float round trips preserve values to 1/max_int
    (SURVEY §7 hard part (d): the reference mixes uint8/uint16/float64)."""
    rng = np.random.default_rng(2)
    for dtype, atol in ((np.uint8, 1 / 255), (np.uint16, 1 / 65535)):
        arr = rng.integers(0, np.iinfo(dtype).max, (12, 10, 3)).astype(dtype)
        img = da.OpticalImage(arr, width=1.0, height=1.0)
        as_float = img.astype(np.float32)
        assert np.asarray(as_float.img).dtype == np.float32
        assert float(np.max(np.asarray(as_float.img))) <= 1.0
        back = as_float.astype(dtype)
        assert np.asarray(back.img).dtype == dtype
        np.testing.assert_array_equal(np.asarray(back.img), arr)
        # float32 is the processing dtype: the round trip above must be
        # exact, and float values stay within atol of the integer grid.
        np.testing.assert_allclose(
            np.asarray(as_float.img),
            arr.astype(np.float64) / np.iinfo(dtype).max,
            atol=atol,
        )


def test_exif_date_missing_and_present(tmp_path):
    """EXIF acquisition datetime is parsed when present, None otherwise
    (reference imread.py:261)."""
    import cv2

    from darsia_tpu.image.imread import _exif_date

    # Plain cv2-written JPEG: no EXIF.
    plain = tmp_path / "plain.jpg"
    cv2.imwrite(str(plain), np.zeros((4, 4, 3), np.uint8))
    assert _exif_date(plain) is None

    # PIL-written JPEG with DateTime EXIF tag 306.
    from PIL import Image as PILImage

    tagged = tmp_path / "tagged.jpg"
    im = PILImage.new("RGB", (4, 4))
    exif = im.getexif()
    exif[306] = "2026:08:16 12:34:56"
    im.save(tagged, exif=exif)
    date = _exif_date(tagged)
    assert date is not None and date.year == 2026 and date.second == 56


def test_time_slicing_metadata_edge_cases():
    """Time slicing keeps dates/times aligned; single-step series and
    out-of-order interval handling."""
    from datetime import datetime

    arr = np.random.default_rng(5).random((6, 6, 4))
    dates = [datetime(2026, 8, 16, 10 + i) for i in range(4)]
    img = da.Image(
        arr,
        series=True,
        scalar=True,
        time=[0.0, 60.0, 120.0, 180.0],
        date=dates,
        dimensions=[1, 1],
    )
    # Scalar series: slice each step, metadata follows.
    for i in range(4):
        sliced = img.time_slice(i)
        assert sliced.time == img.time[i]
        assert sliced.date == dates[i]
    # Interval of length 1 stays a series.
    one = img.time_interval(slice(2, 3))
    assert one.series and one.time_num == 1
    assert one.time == [120.0]
    # Negative-step slicing errors out clearly or reverses consistently.
    interval = img.time_interval(slice(1, 4))
    assert interval.time == [60.0, 120.0, 180.0]
    assert interval.date == dates[1:4]


def test_append_builds_series():
    """Appending single images builds a time series with stacked data and
    concatenated dates/times (reference image.py:372-440)."""
    from datetime import datetime

    a = da.ScalarImage(
        np.ones((8, 10), np.float32), width=1.0, height=1.0,
        date=datetime(2026, 1, 1, 12, 0, 0), time=0.0,
    )
    b = da.ScalarImage(
        2 * np.ones((8, 10), np.float32), width=1.0, height=1.0,
        date=datetime(2026, 1, 1, 12, 10, 0), time=0.0,
    )
    a.append(b, offset=600.0)
    assert a.series and a.time_num == 2
    assert a.img.shape == (8, 10, 2)
    assert np.asarray(a.time_slice(0).img).max() == 1.0
    assert np.asarray(a.time_slice(1).img).min() == 2.0
    assert a.time == [0.0, 600.0]
    # shape mismatch rejected
    c = da.ScalarImage(np.ones((4, 10), np.float32), width=1.0, height=1.0)
    with pytest.raises(ValueError):
        a.append(c)


def test_reset_reference_time():
    from datetime import datetime

    dates = [datetime(2026, 1, 1, 12, 0, k) for k in (30, 40, 50)]
    img = da.ScalarImage(
        np.zeros((4, 4, 3), np.float32), width=1.0, height=1.0,
        series=True, date=dates,
        reference_date=datetime(2026, 1, 1, 12, 0, 0),
    )
    assert img.time == [30.0, 40.0, 50.0]
    img.reset_reference_time()
    assert img.time == [0.0, 10.0, 20.0]
    assert img.reference_date == dates[0]


def test_update_metadata(optical):
    optical.update_metadata({"name": "renamed"}, series=False)
    assert optical.name == "renamed"


def test_geometry_and_integral():
    img = da.ScalarImage(
        np.full((10, 20), 3.0, np.float32), width=2.0, height=1.0
    )
    geom = img.geometry()
    # integral = mean * area
    assert img.integral() == pytest.approx(3.0 * 2.0 * 1.0)
    assert float(geom.integrate(img)) == pytest.approx(6.0)
    # non-scalar refuses
    rgb = da.OpticalImage(np.zeros((4, 4, 3), np.float32), width=1, height=1)
    with pytest.raises(NotImplementedError):
        rgb.integral()


def test_image_resize_in_place(optical):
    H, W = optical.num_voxels
    optical.resize(0.5)
    assert optical.num_voxels == [H // 2, W // 2]
    # physical dimensions unchanged
    assert optical.dimensions[0] == pytest.approx(1.0)
    assert optical.dimensions[1] == pytest.approx(2.0)


def test_image_roi_callable():
    img = da.ScalarImage(
        np.arange(200, dtype=np.float32).reshape(10, 20),
        width=2.0, height=1.0,
    )
    roi = da.ROI([[0.5, 0.25], [1.5, 0.25], [1.5, 0.75], [0.5, 0.75]])
    sub = img.roi(roi)
    assert sub.num_voxels[0] < 10 and sub.num_voxels[1] < 20
    # callable form agrees
    sub2 = roi(img)
    assert np.array_equal(np.asarray(sub.img), np.asarray(sub2.img))


def test_reset_origin():
    img = da.ScalarImage(
        np.zeros((6, 8), np.float32), width=2.0, height=1.0
    )
    old = img.copy()
    returned = img.reset_origin(return_image=True)
    # returned copy keeps the old system; self reset to reversed-axis origin
    assert np.allclose(np.asarray(returned.origin), np.asarray(old.origin))
    assert np.asarray(img.origin)[1] == pytest.approx(1.0)


def test_scalar_to_csv(tmp_path):
    img = da.ScalarImage(
        np.arange(6, dtype=np.float32).reshape(2, 3), width=3.0, height=2.0
    )
    out = tmp_path / "cells.csv"
    img.to_csv(out, header="x,y,value", float_format="{:.4e}")
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "x,y,value"
    assert len(lines) == 1 + 6
    first = [float(v) for v in lines[1].split(",")]
    # first voxel center: x=0.5, y=1.5 (top row), value 0
    assert first == pytest.approx([0.5, 1.5, 0.0])
    with pytest.raises(ValueError):
        img.to_csv(out, header="onlyone")


def test_optical_encode_roundtrip(optical):
    import cv2

    payload = optical.encode(".png")
    assert isinstance(payload, bytes) and len(payload) > 0
    decoded = cv2.imdecode(
        np.frombuffer(payload, np.uint8), cv2.IMREAD_UNCHANGED
    )[..., ::-1]
    expected = (np.clip(optical.as_numpy(), 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(decoded, expected)
    # jpg is lossy but close
    jpg = optical.encode("jpg", quality=95)
    assert isinstance(jpg, bytes) and len(jpg) > 0


def test_pixel_vector_inverts_coordinate_vector(optical):
    cs = optical.coordinatesystem
    vec = np.array([[3.0, -2.0], [0.0, 5.0]])
    back = cs.pixel_vector(cs.coordinate_vector(vec))
    np.testing.assert_allclose(back, vec, atol=1e-12)


def test_extensive_image_is_scalar_image():
    ext = da.ExtensiveImage(
        np.ones((4, 5), np.float32), width=1.0, height=1.0
    )
    assert isinstance(ext, da.ScalarImage)
    assert ext.scalar
