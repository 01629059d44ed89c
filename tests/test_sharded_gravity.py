"""Multi-chip self-gravity (reference: the cross-rank multipole path,
ryoanji/interface/global_multipole.hpp:45): sharded runs with gravity
must match the single-device propagator."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from sphexa_tpu.config import SphConfig
from sphexa_tpu.domain.hilbert import AXIS as HAXIS, HilbertConfig
from sphexa_tpu.init.evrard import init_evrard
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.propagator.ve import make_ve_step
from sphexa_tpu.propagator.ve_hilbert import (distribute_hilbert,
                                              make_ve_step_hilbert)
from sphexa_tpu.state import SimState, _FIELDS


@pytest.mark.multichip
@pytest.mark.slow
def test_hilbert_gravity_matches_single():
    cfg = SphConfig(chunk=512, cell_cap=512, ngpad=256, gravG=1.0,
                    gravity_solver="direct", eps=0.02)
    state, box, cfg = init_evrard(10, cfg, dt0=1e-3)
    alive = np.asarray(state.p.alive)
    n = int(alive.sum())
    h_max = float(np.asarray(state.p.h)[alive].max())
    grid = CellGrid(choose_level(box, h_max * 1.3))

    step1 = make_ve_step(box, grid, cfg)
    s1 = state
    for _ in range(3):
        s1, d1 = step1(s1)

    D = 2
    mesh = Mesh(np.array(jax.devices()[:D]), (HAXIS,))
    hc = HilbertConfig(n_ranks=D, cap=state.p.n, halo_cap=state.p.n,
                       mig_cap=256, coarse=4, dilate=2)
    host = {f: np.asarray(getattr(state.p, f))[alive] for f in _FIELDS[:-1]}
    ps = distribute_hilbert(host, box, hc, mesh)
    sN = SimState(p=ps, ttot=state.ttot, dt=state.dt, dt_m1=state.dt_m1,
                  iteration=state.iteration)
    stepN = make_ve_step_hilbert(box, grid, cfg, hc, mesh)
    for _ in range(3):
        sN, dN = stepN(sN)

    assert int(dN.lost) == 0
    assert int(dN.n_owned) == n
    np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-5)
    np.testing.assert_allclose(float(dN.eint), float(d1.eint), rtol=1e-5)
    # etot includes egrav on both sides
    np.testing.assert_allclose(float(dN.etot), float(d1.etot), rtol=1e-4)
    np.testing.assert_allclose(float(dN.ecin), float(d1.ecin), rtol=3e-3,
                               atol=1e-10)
