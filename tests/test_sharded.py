"""Sharded slab-domain step vs the single-device propagator
(reference analog: domain/test/integration_mpi/domain_2ranks.cpp and
domain_nranks.cpp — multi-rank results must match single-rank)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sphexa_tpu.config import SphConfig
from sphexa_tpu.domain.slab import AXIS, SlabConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.propagator.ve import make_ve_step
from sphexa_tpu.propagator.ve_sharded import distribute, make_ve_step_sharded
from sphexa_tpu.state import SimState, _FIELDS


def run_pair(side, n_devices, steps, dt0):
    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(side, cfg, dt0=dt0)
    n = side ** 3
    grid = CellGrid(choose_level(box, float(state.p.h[0]) * 1.4))

    # single device
    step1 = make_ve_step(box, grid, cfg)
    s1 = state
    for _ in range(steps):
        s1, d1 = step1(s1)

    # sharded
    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, (AXIS,))
    sc = SlabConfig(n_slabs=n_devices, cap=int(n / n_devices * 2.5) + 64,
                    halo_cap=int(n / n_devices * 2.0) + 64, mig_cap=256)
    host = {f: np.asarray(getattr(state.p, f)) for f in _FIELDS[:-1]}
    ps = distribute(host, box, sc, mesh)
    sN = SimState(p=ps, ttot=state.ttot, dt=state.dt, dt_m1=state.dt_m1,
                  iteration=state.iteration)
    stepN = make_ve_step_sharded(box, grid, cfg, sc, mesh)
    for _ in range(steps):
        sN, dN = stepN(sN)
    return s1, d1, sN, dN


@pytest.mark.multichip
@pytest.mark.parametrize(
    "n_devices,side",
    [(2, 12), pytest.param(4, 20, marks=pytest.mark.slow)])
def test_sharded_matches_single(n_devices, side):
    steps = 5
    s1, d1, sN, dN = run_pair(side=side, n_devices=n_devices, steps=steps,
                              dt0=2e-4)
    assert float(dN.halo_frac) < 1.0, "slabs narrower than halo radius"

    assert int(dN.lost) == 0
    assert int(dN.n_owned) == side ** 3
    assert int(dN.max_nc) <= 256
    np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-4)
    np.testing.assert_allclose(float(dN.ecin), float(d1.ecin), rtol=2e-3,
                               atol=1e-7)
    np.testing.assert_allclose(float(dN.eint), float(d1.eint), rtol=1e-4)

    # per-particle cross-check: match by position, compare velocity/temp
    def collect(ps):
        alive = np.asarray(ps.alive)
        return {f: np.asarray(getattr(ps, f))[alive]
                for f in ("x", "y", "z", "vx", "temp", "h")}

    a = collect(s1.p)
    b = collect(sN.p)
    assert a["x"].shape == b["x"].shape

    from scipy.spatial import cKDTree
    tree = cKDTree(np.c_[a["x"], a["y"], a["z"]])
    d, j = tree.query(np.c_[b["x"], b["y"], b["z"]])
    assert d.max() < 1e-5, f"unmatched particle, dist {d.max()}"
    assert len(np.unique(j)) == len(j)  # bijective matching
    vscale = np.abs(a["vx"]).max() + 1e-12
    assert np.abs(b["vx"] - a["vx"][j]).max() / vscale < 5e-3
    tscale = np.abs(a["temp"]).max()
    assert np.abs(b["temp"] - a["temp"][j]).max() / tscale < 1e-4
    assert np.abs(b["h"] - a["h"][j]).max() / a["h"].max() < 1e-4
