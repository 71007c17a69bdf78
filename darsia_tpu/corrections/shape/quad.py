"""Quadrilateral ROI extraction via projective warp (cv2-free).

Parity: reference ``src/darsia/image/subregions.py:31`` (which wraps
cv2.getPerspectiveTransform + warpPerspective).  Here the 3x3 homography is
solved exactly on the host (8x8 linear system) and the resampling is the
shared warp kernel — so a crop inside a correction chain fuses with the rest
of the chain into a single gather pass.
"""

from __future__ import annotations

from typing import Literal, Optional, Union
from warnings import warn

import jax.numpy as jnp
import numpy as np

from ...ops.warp import perspective_grid, warp_backend
from ...utils.point import VoxelArray

__all__ = ["extract_quadrilateral_ROI", "homography_from_points", "quad_coordinate_grid"]


def homography_from_points(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact 4-point homography H with H @ [src, 1] ~ [dst, 1].

    Points are (x, y) pairs (any consistent convention).  Direct DLT solve of
    the 8-dof system (host-side, setup-time).
    """
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    assert src.shape == (4, 2) and dst.shape == (4, 2)
    A = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        A[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(A, b)
    return np.array(
        [[h[0], h[1], h[2]], [h[3], h[4], h[5]], [h[6], h[7], 1.0]]
    )


def quad_coordinate_grid(
    pts_src_rowcol: np.ndarray,
    out_shape: tuple[int, int],
    pts_dst_rowcol: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Pull-back coordinate field for a quadrilateral -> rectangle warp.

    Args:
        pts_src_rowcol: 4 source corner points in (row, col) order —
            top-left, bottom-left, bottom-right, top-right.
        out_shape: (height, width) of the output.
        pts_dst_rowcol: optional explicit destination points (row, col).

    Returns:
        (2, H, W) coordinate field usable with :func:`darsia_tpu.ops.warp.warp`.

    """
    height, width = out_shape
    if pts_dst_rowcol is None:
        pts_dst_rowcol = np.array(
            [
                [0, 0],
                [height - 1, 0],
                [height - 1, width - 1],
                [0, width - 1],
            ],
            dtype=np.float64,
        )
    # Homography mapping *destination* (row, col) -> *source* (row, col):
    # that's the pull-back map the warp kernel needs.
    H = homography_from_points(pts_dst_rowcol, np.asarray(pts_src_rowcol))
    return perspective_grid(jnp.asarray(H, dtype=jnp.float32), (height, width))


def extract_quadrilateral_ROI(
    img_src,
    pts_src=None,
    indexing: Literal["matrix", "reverse matrix"] = "reverse matrix",
    interpolation: str = "inter_linear",
    **kwargs,
) -> jnp.ndarray:
    """Extract a quadrilateral ROI via perspective transform.

    Args:
        img_src: source array (2d scalar or 3d multichannel).
        pts_src: 4 corner points — upper-left first, counter-clockwise.
            VoxelArray uses matrix (row, col) indexing; plain lists/arrays
            are interpreted per ``indexing``.
        indexing: interpretation of plain-array ``pts_src``.
        interpolation: "inter_nearest" or "inter_linear".
        kwargs: ``width``/``height`` physical target dims (sets aspect
            ratio), or ``shape``; optional ``pts_dst``.

    """
    img_src = jnp.asarray(img_src)
    original_shape = img_src.shape[:2]

    # ---- output size
    if "width" in kwargs and "height" in kwargs:
        target_width = float(kwargs["width"])
        target_height = float(kwargs["height"])
        aspect_ratio = target_width / target_height
        original_height, original_width = original_shape
        width = min(original_width, int(aspect_ratio * float(original_height)))
        height = min(original_height, int(1.0 / aspect_ratio * float(original_width)))
    else:
        height, width = kwargs.get("shape", original_shape)

    # ---- source points in (row, col)
    if pts_src is None:
        pts_src_rc = np.array(
            [
                [0, 0],
                [original_shape[0], 0],
                [original_shape[0], original_shape[1]],
                [0, original_shape[1]],
            ],
            dtype=np.float64,
        )
    elif isinstance(pts_src, VoxelArray):
        pts_src_rc = np.asarray(pts_src, dtype=np.float64)
    else:
        pts_src_rc = np.asarray(pts_src, dtype=np.float64)
        if indexing == "reverse matrix":
            pts_src_rc = pts_src_rc[:, ::-1]

    pts_dst_rc = None
    if "pts_dst" in kwargs:
        pts_dst = kwargs["pts_dst"]
        if isinstance(pts_dst, VoxelArray):
            pts_dst_rc = np.asarray(pts_dst, dtype=np.float64)
        else:
            pts_dst_rc = np.asarray(pts_dst, dtype=np.float64)
            if indexing == "reverse matrix":
                pts_dst_rc = pts_dst_rc[:, ::-1]

    coords = quad_coordinate_grid(pts_src_rc, (height, width), pts_dst_rc)
    order = 0 if interpolation == "inter_nearest" else 1
    dtype = img_src.dtype
    out = warp_backend(img_src.astype(jnp.float32), coords, order=order)
    if jnp.issubdtype(dtype, jnp.integer):
        out = jnp.round(out)
    return out.astype(dtype)
