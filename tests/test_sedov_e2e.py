"""End-to-end Sedov: full VE step loop on a small grid; checks energy
conservation and shock sanity (reference analog: running
sphexa --init sedov -n 30 -s 20 and the compare_solutions.py L1 gate)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.propagator.ve import make_ve_step, compute_energies


@pytest.mark.slow
def test_sedov_conservation():
    side = 20
    cfg = SphConfig(chunk=1000, cell_cap=256, ngpad=192)
    state, box, cfg = init_sedov(side, cfg)
    h0 = float(state.p.h[0])
    grid = CellGrid(choose_level(box, h0 * 1.6))
    step = make_ve_step(box, grid, cfg)

    ecin0, eint0 = compute_energies(state.p, cfg)
    e0 = float(ecin0 + eint0)
    np.testing.assert_allclose(e0, 1.0, rtol=2e-3)  # energyTotal = 1

    diags = []
    for _ in range(20):
        state, diag = step(state)
        diags.append(diag)

    d = diags[-1]
    etot = float(d.etot)
    # fp32 + AB2 integrator: total energy conserved to small tolerance
    assert abs(etot - e0) / e0 < 5e-3, f"energy drift {etot} vs {e0}"
    # the explosion converts internal -> kinetic energy monotonically
    ecins = [float(dd.ecin) for dd in diags]
    assert ecins[-1] > 0.0 and ecins[-1] > ecins[4]
    # timestep stays sane and grows from the tiny initial value
    assert 1e-6 <= float(d.dt) < 1.0
    assert float(d.ttot) > 0.0
    # no neighbor-list overflows
    assert int(d.max_nc) <= cfg.ngpad
    assert int(d.max_cell_count) <= cfg.cell_cap
    # h stays bounded
    assert 0.5 * h0 < float(d.h_max) < 4 * h0

    # momentum stays ~zero by symmetry
    ps = state.p
    m = np.where(np.asarray(ps.alive), np.asarray(ps.m), 0.0)
    px = float(np.sum(m * np.asarray(ps.vx, np.float64)))
    assert abs(px) < 1e-5


@pytest.mark.slow
def test_sedov_shock_profile():
    """After some expansion the density peak must sit off-center and the
    center must evacuate (qualitative Sedov structure)."""
    side = 20
    cfg = SphConfig(chunk=1000, cell_cap=256, ngpad=192)
    # start near the Courant limit so the shock develops in few steps
    state, box, cfg = init_sedov(side, cfg, dt0=2e-4)
    grid = CellGrid(choose_level(box, float(state.p.h[0]) * 1.6))
    step = make_ve_step(box, grid, cfg)

    for _ in range(60):
        state, diag = step(state)

    ps = state.p
    r = np.sqrt(np.asarray(ps.x) ** 2 + np.asarray(ps.y) ** 2 + np.asarray(ps.z) ** 2)
    vr = (np.asarray(ps.vx) * np.asarray(ps.x) + np.asarray(ps.vy) * np.asarray(ps.y)
          + np.asarray(ps.vz) * np.asarray(ps.z)) / np.maximum(r, 1e-12)
    # strong shock: center fully evacuated, outward shell flow, quiet exterior
    assert (r < 0.1).sum() == 0, "center should be evacuated"
    shell = (r >= 0.25) & (r < 0.4)
    outer = r >= 0.45
    assert vr[shell].mean() > 0.5           # fast outward shell
    assert abs(vr[outer].mean()) < 0.2      # undisturbed exterior
