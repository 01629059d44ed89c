"""Neighbor engine vs O(N^2) all-pairs oracle (reference analog:
domain/test/unit/neighbors/all_to_all.hpp cross-checks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.neighbors import CellGrid, build_cell_list, build_neighbor_list, choose_level
from sphexa_tpu.sfc.box import Box, Boundary

from oracle import all_pairs_neighbors


def make_cloud(n, rng, lo=-0.5, hi=0.5):
    return [rng.uniform(lo, hi, n) for _ in range(3)]


def neighbor_sets_from_list(nl, perm, n):
    """Convert the (sorted-frame) [N, K] list into per-original-particle
    sets of original indices."""
    perm = np.asarray(perm)
    idx = np.asarray(nl.idx)
    nc = np.asarray(nl.nc)
    sets = [set() for _ in range(n)]
    for srt in range(n):
        orig = perm[srt]
        sets[orig] = set(perm[idx[srt, :nc[srt]]])
    return sets


@pytest.mark.parametrize("boundary", [Boundary.periodic, Boundary.open])
def test_neighbor_list_matches_all_pairs(boundary):
    rng = np.random.default_rng(3)
    n = 500
    x, y, z = make_cloud(n, rng)
    h = np.full(n, 0.09) * rng.uniform(0.8, 1.2, n)
    box = Box.cube(-0.5, 0.5, boundary)

    cfg = SphConfig(chunk=128, cell_cap=128, ngpad=200)
    grid = CellGrid(choose_level(box, float(h.max())))
    xs = jnp.asarray(x, jnp.float32)
    ys = jnp.asarray(y, jnp.float32)
    zs = jnp.asarray(z, jnp.float32)
    hs = jnp.asarray(h, jnp.float32)

    cl = build_cell_list(grid, box, xs, ys, zs)
    perm = cl.perm
    nl = build_neighbor_list(grid, box, cl, xs[perm], ys[perm], zs[perm],
                             hs[perm], cfg, adapt_h=False)

    assert int(nl.max_cell_count) <= cfg.cell_cap
    assert int(nl.max_nc) <= cfg.ngpad

    got = neighbor_sets_from_list(nl, perm, n)
    within = all_pairs_neighbors(x, y, z, h, box)
    for i in range(n):
        expected = set(np.flatnonzero(within[i]))
        # fp32 vs fp64 can disagree for pairs exactly at the cutoff
        sym_diff = got[i] ^ expected
        for j in sym_diff:
            rx, ry, rz = x[i] - x[j], y[i] - y[j], z[i] - z[j]
            if boundary == Boundary.periodic:
                rx -= np.round(rx)
                ry -= np.round(ry)
                rz -= np.round(rz)
            d = np.sqrt(rx**2 + ry**2 + rz**2)
            assert abs(d - 2 * h[i]) < 1e-5, (i, j, d, 2 * h[i])


def test_h_adaptation_reaches_target():
    """Start with a bad h guess; the coupled iteration must move neighbor
    counts toward ng0 (reference: find_neighbors.hpp h loop)."""
    rng = np.random.default_rng(11)
    side = 16
    g = (np.arange(side) + 0.5) / side - 0.5
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    x, y, z = X.ravel(), Y.ravel(), Z.ravel()
    n = x.size
    box = Box.cube(-0.5, 0.5, Boundary.periodic)

    # ideal h for ng0=100: (3/(4 pi) * ng0 * V / N)^(1/3) / 2... start 2x off
    h0 = np.full(n, 0.5 * (3.0 / (4 * np.pi) * 100 * 1.0 / n) ** (1 / 3))
    h_bad = h0 * 1.7

    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=512, h_iter=10)
    grid = CellGrid(choose_level(box, float(h_bad.max())))
    xs, ys, zs, hs = (jnp.asarray(v, jnp.float32) for v in (x, y, z, h_bad))
    cl = build_cell_list(grid, box, xs, ys, zs)
    p = cl.perm
    nl = build_neighbor_list(grid, box, cl, xs[p], ys[p], zs[p], hs[p], cfg,
                             adapt_h=True)
    nc = np.asarray(nl.nc_sph)
    assert nc.mean() < 160, nc.mean()   # started near ~480
    assert nc.min() >= 25


def test_dead_particles_invisible():
    rng = np.random.default_rng(5)
    n = 64
    x, y, z = make_cloud(n, rng)
    # dead particles sitting right on top of particle 0
    xd = np.concatenate([x, np.full(8, x[0])])
    yd = np.concatenate([y, np.full(8, y[0])])
    zd = np.concatenate([z, np.full(8, z[0])])
    alive = np.concatenate([np.ones(n, bool), np.zeros(8, bool)])
    h = np.full(n + 8, 0.2)
    box = Box.cube(-0.5, 0.5, Boundary.periodic)

    cfg = SphConfig(chunk=72, cell_cap=128, ngpad=128)
    grid = CellGrid(2)
    xs, ys, zs, hs = (jnp.asarray(v, jnp.float32) for v in (xd, yd, zd, h))
    cl = build_cell_list(grid, box, xs, ys, zs, alive=jnp.asarray(alive))
    p = np.asarray(cl.perm)
    # all dead particles sort to the end
    assert set(p[n:]) == set(range(n, n + 8))
    nl = build_neighbor_list(grid, box, cl, xs[cl.perm], ys[cl.perm], zs[cl.perm],
                             hs[cl.perm], cfg, adapt_h=False)
    idx = np.asarray(nl.idx)
    nc = np.asarray(nl.nc)
    for srt in range(n):  # alive rows only
        listed = idx[srt, :nc[srt]]
        assert (listed < n).all()  # sorted frame: dead rows are >= n
