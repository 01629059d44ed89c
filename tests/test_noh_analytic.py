"""Noh physics acceptance: pre-shock infall density must follow the
closed-form (1 + t/r)^2 profile (reference: compare_noh.py L1 gate)."""

import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.noh import init_noh
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.observables.noh_solution import noh_profile
from sphexa_tpu.observables.radial import l1_error, radial_profile
from sphexa_tpu.propagator.ve import compute_forces_ve, make_ve_step


def test_noh_solution_shapes():
    r = np.array([0.01, 0.1, 0.3])
    gamma = 5.0 / 3.0
    rho, u, p = noh_profile(r, t=0.6, gamma=gamma)
    # shock at (gamma-1)/2 * t = 0.2
    assert rho[0] == pytest.approx(64.0)     # 4^3 for gamma = 5/3
    assert u[0] == 0.0 and p[0] > 0
    assert u[2] == -1.0 and p[2] == 0.0
    assert rho[2] == pytest.approx((1 + 0.6 / 0.3) ** 2)


@pytest.mark.slow
def test_noh_infall_profile():
    side = 20
    cfg = SphConfig(chunk=1000, cell_cap=256, ngpad=256)
    state, box, cfg = init_noh(side, cfg, dt0=5e-4)
    grid = CellGrid(choose_level(box, float(state.p.h[0]) * 1.4))
    step = make_ve_step(box, grid, cfg)

    for _ in range(60):
        state, diag = step(state)
    t = float(diag.ttot)
    assert t > 0.02

    ps = state.p
    _, _, aux = compute_forces_ve(ps, box, grid, cfg, state.dt)
    centers, rho_sim, counts = radial_profile(ps.x, ps.y, ps.z, aux["rho"],
                                              nbins=24, rmax=0.45)
    rho_ana, _, _ = noh_profile(centers, t, cfg.gamma)
    # compare the infall region only (outside shock + a smoothing length)
    rs = 0.5 * (cfg.gamma - 1.0) * t
    sel = (counts > 5) & (centers > rs + 2 * float(diag.h_max))
    assert sel.sum() >= 5
    err = l1_error(rho_sim[sel], rho_ana[sel])
    assert err < 0.15, err
