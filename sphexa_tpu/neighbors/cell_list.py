"""Uniform cell-list construction over Morton-ordered cells.

TPU-native replacement for the reference's octree-based neighbor search
(reference: domain/include/cstone/findneighbors.hpp:96 CPU walk,
traversal/find_neighbors.cuh warp traversal). Instead of divergent tree
walks we build a *dense* uniform grid at a power-of-two resolution:

  1. every particle gets a Morton cell id (cells, not full-depth keys)
  2. particles are sorted by cell id (one XLA sort per step)
  3. cell_start[] gives contiguous index ranges per cell via searchsorted

This turns neighbor candidate collection into 27 contiguous-range
gathers — regular, fully batched, and XLA/Pallas-friendly. The grid
level is chosen so the cell edge is >= the largest search radius 2*h.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax.numpy as jnp

from sphexa_tpu.config import INDEX_DTYPE
from sphexa_tpu.sfc.box import Box, normalize_coords
from sphexa_tpu.sfc.morton import morton_encode


@dataclasses.dataclass(frozen=True)
class CellGrid:
    """Static description of the search grid (hashable, jit-static)."""
    level: int  # cells per dim = 2^level

    @property
    def cells_per_dim(self) -> int:
        return 1 << self.level

    @property
    def num_cells(self) -> int:
        return 1 << (3 * self.level)

    def cell_size(self, box: Box):
        n = self.cells_per_dim
        return (box.lx / n, box.ly / n, box.lz / n)


def choose_level(box: Box, h_max: float, slack: float = 1.05,
                 max_level: int = 8) -> int:
    """Largest level whose cell edge still covers the search radius 2*h_max
    (with slack for h growth between re-compilations)."""
    min_len = min(box.lx, box.ly, box.lz)
    radius = 2.0 * h_max * slack
    if radius <= 0:
        return max_level
    level = int(math.floor(math.log2(max(min_len / radius, 1.0))))
    return max(1, min(level, max_level))


class CellList(NamedTuple):
    perm: jnp.ndarray        # [N] particle permutation: sorted <- original
    cid: jnp.ndarray         # [N] cell id per sorted particle (uint32)
    cell_start: jnp.ndarray  # [num_cells + 1] first sorted index per cell
    coords: tuple            # (ix, iy, iz) integer cell coords per sorted particle


def cell_id_of(grid: CellGrid, box: Box, x, y, z):
    nx, ny, nz = normalize_coords(box, x, y, z)
    n = grid.cells_per_dim
    ix = jnp.minimum((nx * n).astype(jnp.uint32), n - 1)
    iy = jnp.minimum((ny * n).astype(jnp.uint32), n - 1)
    iz = jnp.minimum((nz * n).astype(jnp.uint32), n - 1)
    return morton_encode(ix, iy, iz), (ix, iy, iz)


def build_cell_list(grid: CellGrid, box: Box, x, y, z, alive=None) -> CellList:
    """Sort particles by Morton cell id and compute per-cell ranges.

    Dead (padding) particles get cell id = num_cells so they sort to the
    end and are invisible to all candidate gathers.
    """
    cid, _ = cell_id_of(grid, box, x, y, z)
    if alive is not None:
        cid = jnp.where(alive, cid, jnp.uint32(grid.num_cells))
    perm = jnp.argsort(cid)
    cid_sorted = cid[perm]
    # first sorted index of every cell (+1 sentinel)
    targets = jnp.arange(grid.num_cells + 1, dtype=jnp.uint32)
    cell_start = jnp.searchsorted(cid_sorted, targets).astype(INDEX_DTYPE)
    xs, ys, zs = x[perm], y[perm], z[perm]
    _, (ix, iy, iz) = cell_id_of(grid, box, xs, ys, zs)
    return CellList(perm.astype(INDEX_DTYPE), cid_sorted, cell_start, (ix, iy, iz))
