"""Unified Wasserstein distance interface.

Parity: reference ``src/darsia/measure/wasserstein.py:11-92``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Literal, Optional

from ..utils.grid import generate_grid
from .beckmann import (
    BeckmannBregmanSolver,
    BeckmannGproxPGHDSolver,
    BeckmannNewtonSolver,
)
from .emd import EMD

__all__ = ["wasserstein_distance", "wasserstein_distance_to_vtk"]


def wasserstein_distance(
    mass_src,
    mass_dst,
    method: Literal[
        "newton", "bregman", "gprox", "sharded_newton", "cv2.emd"
    ] = "newton",
    weight=None,
    **kwargs,
):
    """Wasserstein-1 distance between two equal-mass images.

    Args:
        mass_src / mass_dst: source/destination distributions (scalar Images).
        method: "newton" | "bregman" | "gprox" (TPU finite-volume solvers),
            "sharded_newton" (domain-decomposed over options["mesh"]), or
            "cv2.emd" (host validation path).
        weight: optional cell weight image (anisotropic metric).
        kwargs: ``options`` dict for the FV solvers.

    """
    method_name = method.lower()
    if method_name == "sharded_newton":
        # Domain-decomposed solve over a jax.sharding.Mesh: pass the mesh
        # via options={"mesh": Mesh(...)}; remaining options forward to
        # darsia_tpu.parallel.beckmann.sharded_beckmann_newton.
        import numpy as np

        from ..parallel.beckmann import sharded_beckmann_newton

        options = dict(kwargs.get("options", {}))
        mesh = options.pop("mesh", None)
        if mesh is None:
            raise ValueError(
                'sharded_newton requires options["mesh"] = '
                "jax.sharding.Mesh(...) naming the devices to shard over."
            )
        return_info = options.pop("return_info", False)
        grid = generate_grid(mass_dst)
        solve = sharded_beckmann_newton(
            mesh,
            tuple(int(s) for s in grid.shape),
            voxel_size=list(grid.voxel_size),
            weight=weight,
            **options,
        )
        # Match the single-device sign convention (BeckmannProblem.__call__
        # solves on dst - src) so the returned pressure agrees across
        # methods; the distance is sign-invariant.
        diff = np.asarray(mass_dst.img, np.float32) - np.asarray(
            mass_src.img, np.float32
        )
        if return_info:
            distance, fluxes, pressure, iterations = solve(
                diff, return_fluxes=True
            )
            return float(distance), {
                "pressure": pressure,
                "flux": fluxes,
                "number_iterations": int(iterations),
            }
        distance, _, _ = solve(diff)
        return float(distance)
    if method_name in ("newton", "bregman", "gprox"):
        grid = generate_grid(mass_dst)
        options = kwargs.get("options", {})
        if method_name == "newton":
            w1 = BeckmannNewtonSolver(grid, weight, options)
        elif method_name == "bregman":
            w1 = BeckmannBregmanSolver(grid, weight, options)
        else:
            w1 = BeckmannGproxPGHDSolver(grid, weight, options)
    elif method_name == "cv2.emd":
        assert weight is None, "Weighted EMD not supported by cv2."
        w1 = EMD(kwargs.get("preprocess"))
    else:
        raise NotImplementedError(f"Method {method_name} not implemented.")
    return w1(mass_src, mass_dst)


def wasserstein_distance_3d(mass_src, mass_dst, **kwargs):
    """Wasserstein-1 distance for 3-D images.

    The reference's paper workflow calls ``darsia.wasserstein_distance_3d``
    (``examples/paper/pet_simulations_comparison_block_b.py:875-886``) but
    the upstream package never defines that symbol — the call would raise
    ``AttributeError`` (latent upstream defect).  Here the Beckmann
    solvers are dimension-generic (per-axis face stencils), so the 3-D
    entry point simply forwards; it exists so the reference's 3-D OT
    comparisons run unmodified.
    """
    if getattr(mass_dst, "space_dim", 3) != 3:
        raise ValueError("wasserstein_distance_3d expects 3-D images.")
    return wasserstein_distance(mass_src, mass_dst, **kwargs)


def wasserstein_distance_to_vtk(path: Path, info: dict) -> None:
    """Export a Wasserstein info dict to a legacy VTK file."""
    from ..utils.formats import Format
    from ..utils.plotting import to_vtk

    data = [
        (key, info[key], fmt)
        for key, fmt in [
            ("src", Format.SCALAR),
            ("dst", Format.SCALAR),
            ("mass_diff", Format.SCALAR),
            ("flux", Format.VECTOR),
            ("weighted_flux", Format.VECTOR),
            ("pressure", Format.SCALAR),
            ("transport_density", Format.SCALAR),
            # Metric fields for weighted runs (ref wasserstein.py:88-89).
            ("weight", Format.TENSOR),
            ("weight_inv", Format.TENSOR),
        ]
        if key in info
    ]
    to_vtk(path, data)
