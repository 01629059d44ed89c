"""Balanced 2-D tile domains x Pallas engine (VERDICT r4 item 7):
multi-device tile runs must match the single-device Pallas path per
particle, stay lossless, and — unlike the column-range scheme — accept
CLUSTERED fields (Evrard) with small imbalance while keeping every
rank's rectangle inside its static window."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.evrard import init_evrard
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.ops.cellmajor import choose_cm_grid
from sphexa_tpu.propagator.ve_pallas import make_ve_step_pallas
from sphexa_tpu.propagator.ve_pallas_tiles import (
    TileDomain, distribute_tiles, make_ve_step_pallas_tiles,
    plan_tile_caps)
from sphexa_tpu.state import SimState, _FIELDS


def _mesh(d):
    return Mesh(np.array(jax.devices()[:d]), ("dom",))


def _tile_domain(box, state, n, R, C, n_part):
    rows_cap, zcols_cap = plan_tile_caps(
        box, dict(n=n, n_rows=R, n_cols=C), state.p.x, state.p.y,
        state.p.z, alive=state.p.alive)
    D = R * C
    return TileDomain(n_rows=R, n_cols=C, n=n,
                      cap=int(n_part * 2 / D) + 256,
                      halo_cap=max(512, n_part // 2), mig_cap=512,
                      rows_cap=rows_cap + 2, zcols_cap=zcols_cap + 2)


def _run_pair(side, R, C, steps=3):
    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(side, cfg, dt0=2e-4)
    h0 = float(state.p.h[0])
    n_part = side ** 3
    grid = choose_cm_grid(box, h0 * 1.3, n_part, cap=128)

    step1 = make_ve_step_pallas(box, grid, cfg, interpret=True)
    s1 = state
    for _ in range(steps):
        s1, d1 = step1(s1)

    td = _tile_domain(box, state, grid.n, R, C, n_part)
    mesh = _mesh(R * C)
    ps_host = {f: np.asarray(getattr(state.p, f)) for f in _FIELDS[:-1]}
    ps = distribute_tiles(ps_host, box, td, mesh)
    sm = SimState(p=ps, ttot=jnp.float32(0), dt=state.dt,
                  dt_m1=state.dt_m1, iteration=jnp.int32(0))
    stepn = make_ve_step_pallas_tiles(box, td, grid.cap, cfg, mesh,
                                      interpret=True)
    for _ in range(steps):
        sm, dm = stepn(sm)
    return s1, d1, sm, dm


@pytest.mark.slow
@pytest.mark.multichip
@pytest.mark.parametrize("R,C", [(2, 2)])
def test_tiles_match_single_device(R, C):
    s1, d1, sm, dm = _run_pair(16, R, C)

    assert int(dm.lost) == 0
    assert int(dm.overflow) == 0
    assert bool(dm.span_ok)
    np.testing.assert_allclose(float(dm.dt), float(d1.dt), rtol=1e-5)
    np.testing.assert_allclose(float(dm.eint), float(d1.eint), rtol=1e-6)
    np.testing.assert_allclose(float(dm.ecin), float(d1.ecin), rtol=1e-3,
                               atol=1e-12)

    # per-particle cross-check (position-matched, like the reference's
    # exchangeParticles + halo integration tests)
    from scipy.spatial import cKDTree
    alive = np.asarray(sm.p.alive)
    b = {f: np.asarray(getattr(sm.p, f))[alive]
         for f in ("x", "y", "z", "vx", "temp", "h")}
    a = {f: np.asarray(getattr(s1.p, f)) for f in
         ("x", "y", "z", "vx", "temp", "h")}
    assert len(b["x"]) == len(a["x"])
    tree = cKDTree(np.c_[a["x"], a["y"], a["z"]])
    d, j = tree.query(np.c_[b["x"], b["y"], b["z"]])
    assert d.max() < 1e-6
    assert len(np.unique(j)) == len(j)
    vscale = np.abs(a["vx"]).max()
    assert np.abs(b["vx"] - a["vx"][j]).max() / vscale < 1e-3
    assert np.abs(b["h"] - a["h"][j]).max() / a["h"].max() < 1e-5


@pytest.mark.medium
@pytest.mark.multichip
def test_tiles_accept_evrard():
    """The VERDICT r4 item-7 'done' bar: the Pallas engine over a
    load-balanced domain ACCEPTS the clustered Evrard IC (the column
    scheme's static row window cannot) with imbalance < 10%, lossless,
    physics finite."""
    cfg = SphConfig(chunk=512, cell_cap=512, ngpad=256)
    state, box, cfg = init_evrard(16, cfg, dt0=1e-4)
    cfg = cfg.replace(gravG=0.0)
    alive = np.asarray(state.p.alive)
    n_part = int(alive.sum())
    h_alive = np.asarray(state.p.h)[alive]
    # occupancy-joint cap: the envelope h bounds the grid at n~2-4, so
    # the uniform cap must absorb the central occupancy (interpret mode
    # has no Mosaic cap ceiling; on the v5e this composition runs the
    # tiered engines instead)
    from sphexa_tpu.ops.cellmajor import choose_cap_and_grid
    cap, grid = choose_cap_and_grid(
        box, float(h_alive.max()) * 1.3, n_part,
        np.asarray(state.p.x)[alive], np.asarray(state.p.y)[alive],
        np.asarray(state.p.z)[alive], cap_max=4096, headroom=16)

    R, C = 2, 2
    td = _tile_domain(box, state, grid.n, R, C, n_part)
    mesh = _mesh(R * C)
    ps_host = {f: np.asarray(getattr(state.p, f))[alive]
               for f in _FIELDS[:-1]}
    ps = distribute_tiles(ps_host, box, td, mesh)
    sm = SimState(p=ps, ttot=jnp.float32(0), dt=state.dt,
                  dt_m1=state.dt_m1, iteration=jnp.int32(0))
    stepn = make_ve_step_pallas_tiles(box, td, grid.cap, cfg, mesh,
                                      interpret=True)
    for _ in range(2):
        sm, dm = stepn(sm)
    assert int(dm.lost) == 0
    assert int(dm.overflow) == 0
    assert bool(dm.span_ok)
    assert int(dm.n_total) == n_part
    assert float(dm.imbalance) < 0.10, float(dm.imbalance)
    assert np.isfinite(float(dm.etot))


def test_tile_splits_balance_clustered():
    """Host-side split check on an 80%-clustered set: tiles reach
    where the column curve cannot — every rank's rectangle stays small
    near the cluster, and counts stay within ~15% of the mean."""
    rng = np.random.default_rng(0)
    n_pts = 4096
    nc = int(n_pts * 0.8)
    pts = np.concatenate([
        0.1 + 0.12 * rng.random((nc, 3)),
        rng.random((n_pts - nc, 3))]) - 0.5
    from sphexa_tpu.sfc.box import Box
    box = Box(-0.5, 0.5, -0.5, 0.5, -0.5, 0.5)
    td = TileDomain(n_rows=4, n_cols=2, n=32, cap=n_pts,
                    halo_cap=n_pts, mig_cap=n_pts, rows_cap=34,
                    zcols_cap=34)
    mesh = _mesh(8)
    ps_host = {f: np.zeros(n_pts, np.float32) for f in _FIELDS[:-1]}
    ps_host["x"], ps_host["y"], ps_host["z"] = pts.T.astype(np.float32)
    ps_host["h"] = np.full(n_pts, 0.05, np.float32)
    ps_host["m"] = np.full(n_pts, 1.0 / n_pts, np.float32)
    ps_host["temp"] = np.ones(n_pts, np.float32)
    ps = distribute_tiles(ps_host, box, td, mesh)
    counts = np.asarray(ps.alive).reshape(8, -1).sum(axis=1)
    mean = counts.mean()
    assert counts.max() / mean - 1.0 < 0.15, counts
