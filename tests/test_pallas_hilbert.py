"""Balanced column-range domains x Pallas engine: multi-device runs
must match the single-device Pallas path per particle, stay lossless,
and balance clustered distributions (reference bar: the +-1% SFC
assignment of domain/include/cstone/domain/assignment.hpp:55)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.ops.cellmajor import choose_cm_grid
from sphexa_tpu.propagator.ve_pallas import make_ve_step_pallas
from sphexa_tpu.propagator.ve_pallas_hilbert import (
    ColDomain, distribute_columns, make_ve_step_pallas_hilbert)
from sphexa_tpu.state import SimState, _FIELDS


def _mesh(d):
    return Mesh(np.array(jax.devices()[:d]), ("dom",))


def _run_pair(side, n_dev, steps=3):
    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(side, cfg, dt0=2e-4)
    h0 = float(state.p.h[0])
    n_part = side ** 3
    # cap-128 cells give a 4x4 column grid at 16^3 — enough columns for
    # the (n+1)-per-rank halo-ring condition with 2 ranks
    grid = choose_cm_grid(box, h0 * 1.3, n_part, cap=128)

    # single-device reference
    step1 = make_ve_step_pallas(box, grid, cfg, interpret=True)
    s1 = state
    for _ in range(steps):
        s1, d1 = step1(s1)

    # multi-device
    cd = ColDomain(n_ranks=n_dev, n=grid.n,
                   cap=int(n_part * 2 / n_dev) + 256,
                   halo_cap=max(512, n_part // 2), mig_cap=512)
    mesh = _mesh(n_dev)
    ps_host = {f: np.asarray(getattr(state.p, f)) for f in _FIELDS[:-1]}
    ps = distribute_columns(ps_host, box, cd, mesh)
    sm = SimState(p=ps, ttot=jnp.float32(0), dt=state.dt,
                  dt_m1=state.dt_m1, iteration=jnp.int32(0))
    stepn = make_ve_step_pallas_hilbert(box, cd, grid.cap, cfg, mesh,
                                        interpret=True)
    for _ in range(steps):
        sm, dm = stepn(sm)
    return s1, d1, sm, dm


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [2])
def test_matches_single_device(n_dev):
    s1, d1, sm, dm = _run_pair(16, n_dev)

    assert int(dm.lost) == 0
    assert int(dm.overflow) == 0
    assert bool(dm.row_span_ok)
    np.testing.assert_allclose(float(dm.dt), float(d1.dt), rtol=1e-5)
    np.testing.assert_allclose(float(dm.eint), float(d1.eint), rtol=1e-6)
    np.testing.assert_allclose(float(dm.ecin), float(d1.ecin), rtol=1e-3,
                               atol=1e-12)

    # per-particle cross-check (position-matched, like the reference's
    # integration tests of exchangeParticles + halo exchange)
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


@pytest.mark.slow
def test_balances_clustered_set():
    """80%-clustered particles: the balanced column ranges must get
    within ~35% of the mean (the column curve's granularity floor for a
    tight corner cluster under the (n+1)-column halo-spacing clamp) and
    beat a fixed-width slab split by a wide margin (slabs land ~5x over
    the mean on this set)."""
    rng = np.random.default_rng(0)
    n = 4096
    nc = int(n * 0.8)
    pts = np.concatenate([
        0.1 + 0.12 * rng.random((nc, 3)),        # dense corner cluster
        rng.random((n - nc, 3))]) - 0.5          # sedov box is centered
    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(12, cfg, dt0=2e-4)  # template fields
    ps_host = {f: np.zeros(n, np.float32) for f in _FIELDS[:-1]}
    ps_host["x"], ps_host["y"], ps_host["z"] = pts.T.astype(np.float32)
    ps_host["h"] = np.full(n, 0.05, np.float32)
    ps_host["m"] = np.full(n, 1.0 / n, np.float32)
    ps_host["temp"] = np.ones(n, np.float32)

    D = 8
    cd = ColDomain(n_ranks=D, n=32, cap=n, halo_cap=n, mig_cap=n)
    mesh = _mesh(D)
    ps = distribute_columns(ps_host, box, cd, mesh)

    # measure the resulting per-rank owned counts
    alive = np.asarray(ps.alive).reshape(D, -1)
    counts = alive.sum(axis=1)
    mean = counts.mean()
    imbalance = counts.max() / mean - 1.0
    assert imbalance < 0.35, counts

    # fixed-width z-slab comparison on the same particle set
    iz = np.clip(((pts[:, 2] + 0.5) * D).astype(np.int64), 0, D - 1)
    slab_counts = np.bincount(iz, minlength=D)
    slab_imb = slab_counts.max() / mean - 1.0
    assert imbalance < slab_imb / 3.0, (imbalance, slab_imb)
