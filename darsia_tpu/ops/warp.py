"""The warp engine — one fused resampling kernel for all geometric corrections.

TPU-first design: the reference implements ~7 separate correction classes
(curvature, affine, rotation, translation, perspective, piecewise
perspective, deformation — reference ``src/darsia/corrections/shape/*``),
each with its own OpenCV/scipy resampling call.  Here they are all *data*: a
correction is a generator of a **coordinate field** (the pull-back sampling
positions), and a single jitted ``warp`` kernel evaluates the image at those
positions.  Chained geometric corrections compose coordinate fields
(function composition on the fields), so an arbitrarily long correction
pipeline costs exactly one gather pass over the image.

``warp`` is built on bilinear interpolation expressed with explicit gathers
(jit/vmap/shard_map-safe); a Pallas fused-gather kernel can slot in behind
the same signature.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "warp",
    "warp_backend",
    "identity_grid",
    "affine_grid",
    "displacement_grid",
    "perspective_grid",
    "compose_coordinate_maps",
]

#: Above this displacement bound the Pallas window chain stops paying off
#: (num_windows ~ 2*D/128 gathers per tile) and the XLA gather warp wins.
PALLAS_MAX_DISP = 1024


def identity_grid(shape: tuple[int, ...]) -> jnp.ndarray:
    """Identity coordinate field: ``coords[d, ...] = index along axis d``.

    Returns array of shape ``(dim, *shape)`` (float32).
    """
    dim = len(shape)
    axes = [
        jax.lax.broadcasted_iota(jnp.float32, shape, dimension=d) for d in range(dim)
    ]
    return jnp.stack(axes, axis=0)


def _gather_nd(data: jnp.ndarray, idx: list[jnp.ndarray]) -> jnp.ndarray:
    """Gather data[idx0, idx1, ...] with trailing channel axes broadcast.

    Uses flattened linear indices + jnp.take: lowers to a single 1d gather,
    measurably faster on TPU than multi-dimensional advanced indexing.
    """
    dim = len(idx)
    spatial = data.shape[:dim]
    flat = data.reshape((-1,) + data.shape[dim:])
    linear = idx[0]
    for d in range(1, dim):
        linear = linear * spatial[d] + idx[d]
    return jnp.take(flat, linear.reshape(-1), axis=0).reshape(
        idx[0].shape + data.shape[dim:]
    )


def warp(
    data: jnp.ndarray,
    coords: jnp.ndarray,
    order: int = 1,
    mode: str = "constant",
    cval: float = 0.0,
) -> jnp.ndarray:
    """Resample ``data`` at (fractional) voxel positions ``coords``.

    Args:
        data: spatial array, shape ``(*spatial, *channels)`` where the number
            of spatial axes equals ``coords.shape[0]``.
        coords: coordinate field, shape ``(dim, *out_spatial)`` giving for
            every output voxel the *input* voxel position to sample.
        order: 0 (nearest) or 1 (bilinear/trilinear).
        mode: out-of-domain handling — "constant" (fill with cval), "nearest"
            (clamp to edge).
        cval: fill value for mode="constant".

    Returns:
        Array of shape ``(*out_spatial, *channels)``.

    """
    dim = coords.shape[0]
    spatial_shape = data.shape[:dim]
    channel_shape = data.shape[dim:]
    out_spatial = coords.shape[1:]

    # Flatten channels into one trailing axis for uniform handling.
    flat = data.reshape(spatial_shape + (-1,)) if channel_shape else data[..., None]
    flat = flat.astype(jnp.float32)
    coords = coords.astype(jnp.float32)

    sizes = jnp.array(spatial_shape, dtype=jnp.float32).reshape(
        (dim,) + (1,) * len(out_spatial)
    )

    if order == 0:
        idx = jnp.round(coords)
        valid = jnp.all((idx >= 0) & (idx <= sizes - 1), axis=0)
        idx = jnp.clip(idx, 0, sizes - 1).astype(jnp.int32)
        vals = _gather_nd(flat, [idx[d] for d in range(dim)])
        if mode == "constant":
            vals = jnp.where(valid[..., None], vals, cval)
        out = vals
    elif order == 1:
        lo = jnp.floor(coords)
        frac = coords - lo
        valid = jnp.all((coords >= 0) & (coords <= sizes - 1), axis=0)

        corners_accum = None
        # Enumerate the 2^dim interpolation corners (static python loop).
        for corner in range(2**dim):
            offs = [(corner >> d) & 1 for d in range(dim)]
            idx = [
                jnp.clip(lo[d] + offs[d], 0, spatial_shape[d] - 1).astype(jnp.int32)
                for d in range(dim)
            ]
            weight = jnp.ones(out_spatial, dtype=jnp.float32)
            for d in range(dim):
                w = frac[d] if offs[d] else (1.0 - frac[d])
                weight = weight * w
            vals = _gather_nd(flat, idx)
            contrib = vals * weight[..., None]
            corners_accum = contrib if corners_accum is None else corners_accum + contrib
        out = corners_accum
        if mode == "constant":
            out = jnp.where(valid[..., None], out, cval)
    else:
        raise NotImplementedError("Only order 0 and 1 supported.")

    if channel_shape:
        return out.reshape(out_spatial + channel_shape)
    return out[..., 0]


def warp_backend(
    data: jnp.ndarray,
    coords: jnp.ndarray,
    order: int = 1,
    mode: str = "constant",
    cval: float = 0.0,
    max_disp: Optional[int] = None,
    force: Optional[str] = None,
) -> jnp.ndarray:
    """Backend-dispatching warp: Pallas two-pass on TPU, XLA gather otherwise.

    Same semantics as :func:`warp` (including ``mode="constant"`` zero fill
    outside the input domain).  The Pallas two-pass kernel
    (:mod:`darsia_tpu.ops.pallas.warp2pass`) needs a static displacement
    bound ``max_disp`` = max |coords - identity|; callers that know it
    (fused correction chains, registration with clipped fields) get the
    ~10x faster lane-gather path on real TPUs.

    Args:
        force: "pallas" / "xla" to override the automatic choice (tests).

    """
    if (
        max_disp is None
        and force is None
        and order == 1
        and coords.shape[0] == 2
        and data.ndim in (2, 3)
        and jax.default_backend() == "tpu"
        and not isinstance(coords, jax.core.Tracer)
    ):
        # Eager call with a concrete coordinate field: derive the static
        # displacement bound with one cheap device reduction (~0.1 ms at 4K
        # vs the ~130 ms saved by the Pallas lane).
        import math

        bound = float(
            jnp.max(jnp.abs(coords - identity_grid(coords.shape[1:])))
        )
        if math.isfinite(bound):
            max_disp = int(math.ceil(bound)) + 1
    use_pallas = force == "pallas" or (
        force is None
        and order == 1
        and coords.shape[0] == 2
        and data.ndim in (2, 3)
        and max_disp is not None
        and max_disp <= PALLAS_MAX_DISP
        and jax.default_backend() == "tpu"
    )
    if not use_pallas:
        return warp(data, coords, order=order, mode=mode, cval=cval)

    from .pallas.warp2pass import warp_two_pass

    out = warp_two_pass(
        data.astype(jnp.float32), coords.astype(jnp.float32), int(max_disp)
    )
    if mode == "constant":
        sizes = jnp.array(data.shape[:2], dtype=jnp.float32).reshape(2, 1, 1)
        valid = jnp.all((coords >= 0) & (coords <= sizes - 1), axis=0)
        out = jnp.where(valid[..., None] if out.ndim == 3 else valid, out, cval)
    return out


def affine_grid(
    matrix: jnp.ndarray,
    translation: jnp.ndarray,
    out_shape: tuple[int, ...],
) -> jnp.ndarray:
    """Coordinate field of an affine pull-back map.

    For each output voxel p, samples input at ``matrix @ p + translation``.

    Args:
        matrix: (dim, dim).
        translation: (dim,).
        out_shape: output spatial shape.

    """
    grid = identity_grid(out_shape)  # (dim, *shape)
    dim = len(out_shape)
    flat = grid.reshape(dim, -1)
    mapped = matrix @ flat + translation[:, None]
    return mapped.reshape((dim,) + out_shape)


def perspective_grid(
    homography: jnp.ndarray, out_shape: tuple[int, int]
) -> jnp.ndarray:
    """Coordinate field of a 2d projective pull-back map.

    ``homography`` is 3x3 acting on homogeneous (row, col, 1) vectors; for
    each output voxel, samples the input at the projected position.
    """
    grid = identity_grid(out_shape)
    ones = jnp.ones((1,) + out_shape, dtype=jnp.float32)
    homo = jnp.concatenate([grid, ones], axis=0).reshape(3, -1)
    mapped = homography @ homo
    mapped = mapped[:2] / mapped[2:3]
    return mapped.reshape((2,) + out_shape)


def displacement_grid(displacement: jnp.ndarray) -> jnp.ndarray:
    """Coordinate field from a displacement field (pull-back convention).

    Args:
        displacement: (dim, *shape) voxel displacements; output voxel p
            samples input at ``p + displacement[:, p]``.

    """
    return identity_grid(displacement.shape[1:]) + displacement


def compose_coordinate_maps(
    outer: jnp.ndarray, inner: jnp.ndarray
) -> jnp.ndarray:
    """Compose two coordinate fields: result(p) = inner(outer(p)).

    Applying ``warp(data, result)`` equals
    ``warp(warp(data, inner), outer)`` up to interpolation error, but costs a
    single gather pass — this is how correction chains fuse.

    Args:
        outer: (dim, *out_shape) coordinate field applied first (the later
            correction in the chain).
        inner: (dim, *mid_shape) coordinate field of the earlier correction.

    """
    dim = outer.shape[0]
    # Sample each component of `inner` at positions `outer`.
    comps = [warp(inner[d], outer, order=1, mode="nearest") for d in range(dim)]
    return jnp.stack(comps, axis=0)
