"""Pallas cell-major engine inside shard_map (z-plane domain) vs the
single-chip Pallas step — the round-2 'sharded x Pallas' combination
(reference analog: the per-stage exchange choreography of
ve_hydro.hpp:132-205 across ranks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sphexa_tpu.config import SphConfig
from sphexa_tpu.domain.slab import AXIS, SlabConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.ops.cellmajor import CMGrid
from sphexa_tpu.propagator.ve_pallas import make_ve_step_pallas
from sphexa_tpu.propagator.ve_pallas_sharded import make_ve_step_pallas_sharded
from sphexa_tpu.propagator.ve_sharded import distribute
from sphexa_tpu.state import SimState, _FIELDS


@pytest.mark.multichip
@pytest.mark.slow
# (8, 12, 8) passes standalone (14:49 wall) but OOMs when run after a
# full suite's accumulated jax caches; 8-device Pallas-sharded coverage
# comes from __graft_entry__.dryrun_multichip(8), which the driver runs
# every round, and the 8-device Hilbert-domain tests.
@pytest.mark.parametrize("n_devices,side,ng", [(2, 12, 4), (4, 12, 4)])
def test_pallas_sharded_matches_single(n_devices, side, ng):
    steps = 3
    cfg = SphConfig(cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(side, cfg, dt0=2e-4)
    n = side ** 3

    # single chip on the same global grid
    grid1 = CMGrid(n=ng, cap=128)
    step1 = make_ve_step_pallas(box, grid1, cfg, interpret=True)
    s1 = state
    for _ in range(steps):
        s1, d1 = step1(s1)

    # sharded: global grid split into z-plane ranges
    nz_loc = ng // n_devices if ng >= n_devices else 1
    assert ng == nz_loc * n_devices or ng % n_devices == 0
    gridN = CMGrid(n=ng, cap=128, nzi=nz_loc)
    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, (AXIS,))
    sc = SlabConfig(n_slabs=n_devices, cap=int(n / n_devices * 2.5) + 64,
                    halo_cap=64, mig_cap=256)
    host = {f: np.asarray(getattr(state.p, f)) for f in _FIELDS[:-1]}
    ps = distribute(host, box, sc, mesh)
    sN = SimState(p=ps, ttot=state.ttot, dt=state.dt, dt_m1=state.dt_m1,
                  iteration=state.iteration)
    stepN = make_ve_step_pallas_sharded(box, gridN, cfg, sc, mesh,
                                        interpret=True)
    for _ in range(steps):
        sN, dN = stepN(sN)

    assert int(dN.lost) == 0
    assert int(dN.overflow) == 0
    assert int(dN.n_owned) == n
    np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-5)
    np.testing.assert_allclose(float(dN.eint), float(d1.eint), rtol=1e-6)
    np.testing.assert_allclose(float(dN.ecin), float(d1.ecin), rtol=2e-3,
                               atol=1e-9)

    from scipy.spatial import cKDTree
    a = {f: np.asarray(getattr(s1.p, f)) for f in ("x", "y", "z", "vx")}
    alive = np.asarray(sN.p.alive)
    b = {f: np.asarray(getattr(sN.p, f))[alive] for f in ("x", "y", "z", "vx")}
    tree = cKDTree(np.c_[a["x"], a["y"], a["z"]])
    d, j = tree.query(np.c_[b["x"], b["y"], b["z"]])
    assert d.max() < 1e-5
    assert len(np.unique(j)) == len(j)
    vscale = max(np.abs(a["vx"]).max(), 1e-12)
    assert np.abs(b["vx"] - a["vx"][j]).max() / vscale < 2e-3
