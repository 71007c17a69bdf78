"""YUV420 transfer path: reconstruction fidelity + imread integration.

The bandwidth-saving transfer (utils/transfer.py) must reproduce the
direct uint8 RGB upload to within a fraction of a uint8 level on photo
content — JPEG sources store chroma 4:2:0-subsampled already, so the
round-trip only reorders the chroma interpolation.
"""

import numpy as np
import pytest

from darsia_tpu.utils.transfer import (
    put_rgb_yuv420,
    reconstruct_rgb_yuv420,
    split_rgb_yuv420,
)


def _photo_like(h=240, w=320, seed=0):
    """Smooth 'photograph' content: low-frequency fields per channel."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    chans = []
    for k in range(3):
        a, b, c = rng.uniform(0.5, 2.0, 3)
        f = 0.5 + 0.4 * np.sin(a * 4 * xx + k) * np.cos(b * 3 * yy) + 0.05 * c
        chans.append(np.clip(f, 0, 1))
    return (np.stack(chans, axis=-1) * 255).astype(np.uint8)


def test_yuv420_roundtrip_photo_content():
    rgb = _photo_like()
    out = np.asarray(put_rgb_yuv420(rgb))
    assert out.shape == rgb.shape and out.dtype == np.uint8
    err = np.abs(out.astype(np.float32) - rgb.astype(np.float32))
    # Smooth content: chroma subsampling is nearly lossless.
    assert err.mean() < 1.0, err.mean()
    assert np.percentile(err, 99) <= 4.0


def test_yuv420_grayscale_exact_luma():
    # Pure gray input has constant chroma (128): reconstruction error is
    # only the YCrCb uint8 round-trip (<= 1 level everywhere).
    g = np.linspace(0, 255, 256, dtype=np.uint8)
    rgb = np.broadcast_to(g[None, :, None], (64, 256, 3)).copy()
    out = np.asarray(put_rgb_yuv420(rgb))
    assert np.max(np.abs(out.astype(int) - rgb.astype(int))) <= 1


def test_yuv420_odd_shapes():
    rgb = _photo_like(h=123, w=77, seed=3)
    out = np.asarray(put_rgb_yuv420(rgb))
    assert out.shape == rgb.shape
    err = np.abs(out.astype(np.float32) - rgb.astype(np.float32))
    assert err.mean() < 2.0


def test_split_shapes():
    rgb = _photo_like(h=101, w=50)
    y, cr, cb = split_rgb_yuv420(rgb)
    assert y.shape == (101, 50)
    assert cr.shape == cb.shape == (51, 25)
    # 1.5 bytes/pixel within rounding of the ceil-half chroma planes.
    total = y.nbytes + cr.nbytes + cb.nbytes
    assert total < 0.53 * rgb.nbytes


def test_reconstruct_matches_put():
    import jax.numpy as jnp

    rgb = _photo_like(seed=7)
    y, cr, cb = split_rgb_yuv420(rgb)
    a = np.asarray(
        reconstruct_rgb_yuv420(jnp.asarray(y), jnp.asarray(cr), jnp.asarray(cb))
    )
    b = np.asarray(put_rgb_yuv420(rgb))
    np.testing.assert_array_equal(a, b)


def test_imread_transfer_option(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import darsia_tpu as da

    rgb = _photo_like(h=120, w=160, seed=11)
    p = tmp_path / "frame.png"  # png: lossless, isolates the transfer error
    cv2.imwrite(str(p), cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))

    exact = da.imread(p, width=1.0, height=1.0)
    yuv = da.imread(p, width=1.0, height=1.0, transfer="yuv420")
    assert yuv.shape == exact.shape
    assert yuv.dtype == exact.dtype
    err = np.abs(
        np.asarray(yuv.img, dtype=np.float32)
        - np.asarray(exact.img, dtype=np.float32)
    )
    assert err.mean() < 1.0
