"""Color-space conversions as pure JAX ops (VPU-friendly, fusable).

Replaces OpenCV ``cvtColor`` on the compute path (reference
``src/darsia/image/image.py:2278-2384`` delegates to cv2).  Float pipelines
follow the cv2 float conventions: RGB in [0, 1], HSV hue in degrees
[0, 360), LAB with L in [0, 100].

All functions operate on arrays with a trailing channel axis and are safe to
``jit`` / ``vmap`` / shard.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "rgb_to_gray",
    "rgb_to_hsv",
    "hsv_to_rgb",
    "rgb_to_hls",
    "rgb_to_lab",
    "lab_to_rgb",
    "convert_trichromatic",
    "to_monochromatic",
]

# ITU-R BT.601 luma weights (cv2's RGB2GRAY).
_GRAY_WEIGHTS = jnp.array([0.299, 0.587, 0.114])


def _as_float(x: jnp.ndarray) -> tuple[jnp.ndarray, float]:
    """Promote integer images to [0,1] float32; return scale for round trip."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        info_max = 255.0 if x.dtype == jnp.uint8 else 65535.0
        return x.astype(jnp.float32) / info_max, info_max
    return x.astype(jnp.float32), 1.0


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """Luma grayscale, preserving the input scale."""
    x = rgb.astype(jnp.float32)
    gray = jnp.tensordot(x, _GRAY_WEIGHTS, axes=([-1], [0]))
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        return jnp.round(gray).astype(rgb.dtype)
    return gray.astype(rgb.dtype)


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB -> HSV. Float convention: H in [0, 360), S, V in [0, 1]."""
    x, _ = _as_float(rgb)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r,
        bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = (h * 60.0) % 360.0
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """HSV (H in degrees) -> RGB in [0, 1]."""
    h, s, v = hsv[..., 0] / 60.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h) % 6
    f = h - jnp.floor(h)
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    r = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v]
    )
    g = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p]
    )
    b = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q]
    )
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_hls(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB -> HLS (H in degrees, L, S in [0, 1])."""
    x, _ = _as_float(rgb)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    l = (maxc + minc) / 2.0
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    denom = jnp.where(l <= 0.5, maxc + minc, 2.0 - maxc - minc)
    s = jnp.where(delta == 0, 0.0, delta / jnp.where(denom == 0, 1.0, denom))
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r,
        bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = (h * 60.0) % 360.0
    return jnp.stack([h, l, s], axis=-1)


# sRGB <-> CIE XYZ (D65) matrices.
_RGB2XYZ = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)
_XYZ2RGB = jnp.array(
    [
        [3.240479, -1.53715, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ]
)
_WHITE = jnp.array([0.950456, 1.0, 1.088754])


def _f_lab(t: jnp.ndarray) -> jnp.ndarray:
    delta = 6.0 / 29.0
    return jnp.where(
        t > delta**3, jnp.cbrt(t), t / (3 * delta**2) + 4.0 / 29.0
    )


def _f_lab_inv(t: jnp.ndarray) -> jnp.ndarray:
    delta = 6.0 / 29.0
    return jnp.where(t > delta, t**3, 3 * delta**2 * (t - 4.0 / 29.0))


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4
    )


def _linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        c <= 0.0031308, 12.92 * c, 1.055 * c ** (1.0 / 2.4) - 0.055
    )


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB -> CIELAB (L in [0,100]); cv2 float convention.

    Matches cv2.cvtColor(..., COLOR_RGB2LAB) on float inputs, which
    linearizes the sRGB gamma before the XYZ transform (verified against
    OpenCV in tests/unit/test_ops_kernels.py)."""
    x, _ = _as_float(rgb)
    x = _srgb_to_linear(x)
    xyz = jnp.tensordot(x, _RGB2XYZ.T, axes=([-1], [0])) / _WHITE
    fx = _f_lab(xyz)
    L = 116.0 * fx[..., 1] - 16.0
    a = 500.0 * (fx[..., 0] - fx[..., 1])
    b = 200.0 * (fx[..., 1] - fx[..., 2])
    return jnp.stack([L, a, b], axis=-1)


def lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    """CIELAB -> sRGB in [0, 1] (inverse of :func:`rgb_to_lab`)."""
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_f_lab_inv(fx), _f_lab_inv(fy), _f_lab_inv(fz)], axis=-1)
    xyz = xyz * _WHITE
    rgb = jnp.tensordot(xyz, _XYZ2RGB.T, axes=([-1], [0]))
    return jnp.clip(_linear_to_srgb(jnp.clip(rgb, 0.0, 1.0)), 0.0, 1.0)


_CONVERSIONS = {
    ("RGB", "HSV"): rgb_to_hsv,
    ("HSV", "RGB"): hsv_to_rgb,
    ("RGB", "HLS"): rgb_to_hls,
    ("RGB", "LAB"): rgb_to_lab,
    ("LAB", "RGB"): lab_to_rgb,
    ("RGB", "BGR"): lambda x: x[..., ::-1],
    ("BGR", "RGB"): lambda x: x[..., ::-1],
    ("RGB", "RGB"): lambda x: x,
}


def convert_trichromatic(
    data: jnp.ndarray, source: str, target: str
) -> jnp.ndarray:
    """Convert between trichromatic color spaces."""
    key = (source.upper(), target.upper())
    if key in _CONVERSIONS:
        return _CONVERSIONS[key](data)
    # Route through RGB.
    if (source.upper(), "RGB") in _CONVERSIONS and (
        "RGB",
        target.upper(),
    ) in _CONVERSIONS:
        return _CONVERSIONS[("RGB", target.upper())](
            _CONVERSIONS[(source.upper(), "RGB")](data)
        )
    raise NotImplementedError(f"Conversion {source} -> {target} not supported.")


def to_monochromatic(rgb: jnp.ndarray, key: str) -> jnp.ndarray:
    """Extract a scalar channel/feature from an RGB array.

    Supported keys: gray, red, green, blue, hue, saturation, value, norm.
    """
    key = key.lower()
    if key == "gray":
        return rgb_to_gray(rgb)
    if key in ("red", "green", "blue"):
        return rgb[..., ("red", "green", "blue").index(key)]
    if key in ("hue", "saturation", "value"):
        hsv = rgb_to_hsv(rgb)
        return hsv[..., ("hue", "saturation", "value").index(key)]
    if key == "norm":
        x, _ = _as_float(rgb)
        return jnp.linalg.norm(x, axis=-1)
    raise NotImplementedError(f"Monochromatic key {key!r} not supported.")
