"""Finite-volume operators on tensor grids.

Parity: reference ``src/darsia/utils/fv.py:14-450``.  Two forms coexist:

* **Sparse-matrix classes** (FVDivergence, FVMass, reconstructions) with a
  ``.mat`` attribute, for API compatibility and host-side verification.
* **Matrix-free array functions** (``face_to_cell``, ``divergence``,
  ``gradient``, ``cell_to_face_average``) used by the jitted TPU solvers —
  per-axis stencil ops, no sparse kernels.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sps

from .grid import Grid

__all__ = [
    "FVDivergence",
    "FVMass",
    "FVTangentialFaceReconstruction",
    "FVFullFaceReconstruction",
    "face_to_cell",
    "cell_to_face_average",
]


class FVDivergence:
    """Sparse FV divergence: flat fluxes -> integrated cell divergence."""

    def __init__(self, grid: Grid) -> None:
        div_data = np.concatenate(
            [
                grid.face_vol[d] * np.tile([1.0, -1.0], grid.num_faces_per_axis[d])
                for d in range(grid.dim)
            ]
        )
        div_row = np.concatenate(
            [np.ravel(grid.connectivity[grid.faces[d]]) for d in range(grid.dim)]
        )
        div_col = np.repeat(np.arange(grid.num_faces, dtype=int), 2)
        self.mat = sps.csc_matrix(
            (div_data, (div_row, div_col)),
            shape=(grid.num_cells, grid.num_faces),
        )


class FVMass:
    """Sparse FV (lumped) mass matrix on cells or faces."""

    def __init__(self, grid: Grid, mode: str = "cells", lumping: bool = True) -> None:
        if mode == "cells":
            self.mat = sps.diags(
                np.prod(grid.voxel_size) * np.ones(grid.num_cells, dtype=float)
            )
        elif mode == "faces":
            if not lumping:
                raise NotImplementedError("Only lumped face mass supported.")
            self.mat = sps.diags(
                np.prod(grid.voxel_size) * np.ones(grid.num_faces, dtype=float)
            )
        else:
            raise ValueError(f"Mode {mode} not supported.")


class FVTangentialFaceReconstruction:
    """Reconstruct tangential flux components on faces (averaging).

    For each face, the tangential components are averaged from the parallel
    faces of the two neighbouring cells (up to 4 in 2d, 8 in 3d).
    """

    def __init__(self, grid: Grid) -> None:
        self.grid = grid

    def __call__(self, flat_flux: np.ndarray) -> list[np.ndarray]:
        grid = self.grid
        arrays = grid.face_arrays(flat_flux)
        out = []
        for d in range(grid.dim):  # faces with normal d
            tangential = []
            for t in range(grid.dim):
                if t == d:
                    continue
                # Average the 4 (2d: up to 4) neighbouring t-faces onto d-faces.
                # Build a cell-centered t-component first, then average the
                # two cells adjacent to each d-face.
                cell_t = _face_to_cell_component(grid, arrays[t], t)
                face_val = 0.5 * (
                    _take(cell_t, slice(0, -1), d) + _take(cell_t, slice(1, None), d)
                )
                tangential.append(face_val)
            out.append(tangential)
        return out


class FVFullFaceReconstruction:
    """Full vector-valued flux on faces (normal + tangential)."""

    def __init__(self, grid: Grid) -> None:
        self.grid = grid
        self.tangential = FVTangentialFaceReconstruction(grid)

    def __call__(self, flat_flux: np.ndarray) -> np.ndarray:
        grid = self.grid
        arrays = grid.face_arrays(flat_flux)
        tangential = self.tangential(flat_flux)
        full = np.zeros((grid.num_faces, grid.dim))
        for d in range(grid.dim):
            idx = grid.faces[d]
            full[idx, d] = np.ravel(arrays[d], "F")
            t_counter = 0
            for t in range(grid.dim):
                if t == d:
                    continue
                full[idx, t] = np.ravel(tangential[d][t_counter], "F")
                t_counter += 1
        return full


def _take(arr, sl, axis):
    slicer = [slice(None)] * arr.ndim
    slicer[axis] = sl
    return arr[tuple(slicer)]


def _face_to_cell_component(grid: Grid, face_array: np.ndarray, axis: int):
    """Average axis-faces to cell centers (zero at boundary closure)."""
    cell = np.zeros(grid.shape, dtype=float)
    before = [slice(None)] * grid.dim
    before[axis] = slice(0, -1)
    after = [slice(None)] * grid.dim
    after[axis] = slice(1, None)
    cell[tuple(before)] += 0.5 * face_array
    cell[tuple(after)] += 0.5 * face_array
    return cell


def face_to_cell(grid: Grid, flat_flux: np.ndarray, pt: Optional[np.ndarray] = None):
    """RT0 reconstruction of cell vector fluxes from face normal fluxes.

    Matrix-free (parity: reference ``utils/fv.py:288``).
    """
    cell_flux = np.zeros((*grid.shape, grid.dim), dtype=float)
    if pt is None:
        pt = np.ones(grid.dim) / 2
    pt = np.atleast_1d(pt)
    arrays = grid.face_arrays(flat_flux)
    for d in range(grid.dim):
        before = [slice(None)] * grid.dim
        before[d] = slice(0, -1)
        after = [slice(None)] * grid.dim
        after[d] = slice(1, None)
        cell_flux[tuple(before) + (Ellipsis, d)] += pt[d] * arrays[d]
        cell_flux[tuple(after) + (Ellipsis, d)] += (1 - pt[d]) * arrays[d]
    return cell_flux


def cell_to_face_average(grid: Grid, cell_qty: np.ndarray, mode: str) -> np.ndarray:
    """Average a cell quantity to faces (arithmetic or regularized harmonic).

    Matrix-free (parity: reference ``utils/fv.py:349``).
    """
    # Normal projection of (possibly tensor-valued) cell quantities.
    if cell_qty.ndim == grid.dim or (
        cell_qty.ndim == grid.dim + 1 and cell_qty.shape[-1] == 1
    ):
        components = [np.asarray(cell_qty).reshape(grid.shape)] * grid.dim
    elif cell_qty.ndim == grid.dim + 1 and cell_qty.shape[-1] == grid.dim:
        components = [cell_qty[..., d] for d in range(grid.dim)]
    elif cell_qty.ndim == grid.dim + 2 and cell_qty.shape[-2:] == (
        grid.dim,
        grid.dim,
    ):
        components = [cell_qty[..., d, d] for d in range(grid.dim)]
    else:
        raise NotImplementedError("Dimension not supported.")

    face_qty = np.zeros(grid.num_faces, dtype=float)
    for d in range(grid.dim):
        a = _take(components[d], slice(0, -1), d)
        b = _take(components[d], slice(1, None), d)
        if mode == "arithmetic":
            avg = 0.5 * (a + b)
        elif mode == "harmonic":
            denom = a + b
            avg = np.where(denom > 0, 2.0 * a * b / np.where(denom == 0, 1, denom), 0.0)
        else:
            raise ValueError(f"Mode {mode} not supported.")
        face_qty[grid.faces[d]] = np.ravel(avg, "F")
    return face_qty
