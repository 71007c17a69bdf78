"""Host->device image transfer paths for bandwidth-limited links.

The production hot loop (reference ``analysis_mass.py:216-330``) is
disk -> decode -> device -> corrected+analyzed.  On a PCIe-attached TPU
the transfer is ~free; on a tunneled/remote device the link is the
bottleneck (measured 11-17 MB/s on the round-4 dev tunnel, see
``docs/roofline.md``), so the bytes shipped per frame set the end-to-end
throughput ceiling.

``put_rgb_yuv420`` ships a 4K RGB photograph as a full-resolution luma
plane plus 2x2-subsampled chroma planes — 1.5 bytes/pixel instead of 3.
JPEG photographs store chroma 4:2:0-subsampled *in the file* (the decoder
bilinearly upsamples it), so re-subsampling the decoded chroma loses
almost nothing beyond interpolation reordering; the reconstruction error
on real photographs is a fraction of a uint8 level (gated by
``tests/unit/test_transfer.py`` and reported by the bench's end-to-end
row).

Host work added: one cv2.cvtColor (RGB->YCrCb) and one INTER_AREA chroma
downsample, a few ms per 4K frame.  Device work: a jitted upsample +
3x3 color matrix, fused by XLA with whatever consumes the frame.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["put_rgb_yuv420", "split_rgb_yuv420", "reconstruct_rgb_yuv420"]

# ITU-R BT.601 full-range (what cv2's YCrCb conversion uses).
_INV = np.array(
    [
        [1.0, 1.403, 0.0],  # R = Y + 1.403 (Cr-128)
        [1.0, -0.714, -0.344],  # G = Y - 0.714 (Cr-128) - 0.344 (Cb-128)
        [1.0, 0.0, 1.773],  # B = Y + 1.773 (Cb-128)
    ],
    dtype=np.float32,
)


def split_rgb_yuv420(rgb_u8: np.ndarray) -> tuple:
    """Host-side split of an (H, W, 3) uint8 RGB frame into
    ``(y, cr_half, cb_half)`` uint8 planes (chroma at ceil-half size)."""
    import cv2

    assert rgb_u8.ndim == 3 and rgb_u8.shape[-1] == 3, rgb_u8.shape
    ycrcb = cv2.cvtColor(np.ascontiguousarray(rgb_u8), cv2.COLOR_RGB2YCrCb)
    h, w = ycrcb.shape[:2]
    hh, hw = (h + 1) // 2, (w + 1) // 2
    y = ycrcb[..., 0]
    cr = cv2.resize(ycrcb[..., 1], (hw, hh), interpolation=cv2.INTER_AREA)
    cb = cv2.resize(ycrcb[..., 2], (hw, hh), interpolation=cv2.INTER_AREA)
    return y, cr, cb


@lru_cache(maxsize=8)
def _reconstruct_fn(shape: tuple, out_dtype: str):
    import jax
    import jax.numpy as jnp

    h, w = shape
    inv = jnp.asarray(_INV)

    def reconstruct(y, cr, cb):
        yf = y.astype(jnp.float32)
        # Bilinear chroma upsample — the inverse of the JPEG decoder's own
        # 4:2:0 upsampling, so quality matches the file's actual content.
        crf = jax.image.resize(
            cr.astype(jnp.float32), (h, w), method="linear"
        ) - 128.0
        cbf = jax.image.resize(
            cb.astype(jnp.float32), (h, w), method="linear"
        ) - 128.0
        planes = jnp.stack([yf, crf, cbf], axis=-1)
        rgb = planes @ inv.T
        return jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(out_dtype)

    return jax.jit(reconstruct)


def reconstruct_rgb_yuv420(y, cr, cb, out_dtype=np.uint8):
    """Device-side reconstruction of the RGB frame from YUV420 planes."""
    fn = _reconstruct_fn(tuple(int(s) for s in y.shape), np.dtype(out_dtype).name)
    return fn(y, cr, cb)


def put_rgb_yuv420(rgb_u8: np.ndarray, out_dtype=np.uint8):
    """Transfer an (H, W, 3) uint8 RGB host frame to the default device at
    1.5 bytes/pixel (YUV420) and return the reconstructed (H, W, 3) device
    array.  Drop-in for ``jnp.asarray(rgb_u8)`` on bandwidth-starved links.
    """
    import jax.numpy as jnp

    y, cr, cb = split_rgb_yuv420(rgb_u8)
    return reconstruct_rgb_yuv420(
        jnp.asarray(y), jnp.asarray(cr), jnp.asarray(cb), out_dtype=out_dtype
    )
