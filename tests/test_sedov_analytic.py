"""Sedov physics acceptance: shock position must follow the analytic
t^{2/5} trajectory (reference analog: compare_solutions.py L1 gate)."""

import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.observables.radial import (l1_error, radial_profile,
                                           shock_radius_from_density)
from sphexa_tpu.observables.sedov_solution import (alpha_constant,
                                                   sedov_profile,
                                                   shock_radius)
from sphexa_tpu.propagator.ve import compute_forces_ve, make_ve_step


def test_alpha_matches_classical_tabulation():
    """Energy-integral constant from the self-similar ODE integration
    must reproduce Sedov's classical values — validates the derivation."""
    assert abs(alpha_constant(5.0 / 3.0) - 0.4936) < 2e-3
    assert abs(alpha_constant(1.4) - 0.8511) < 2e-3


@pytest.mark.slow
def test_sedov_shock_trajectory():
    side = 24
    cfg = SphConfig(chunk=1728, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(side, cfg, dt0=2e-4)
    grid = CellGrid(choose_level(box, float(state.p.h[0]) * 1.6))
    step = make_ve_step(box, grid, cfg)

    # The Gaussian spike (width 0.1) is not a perfect point explosion;
    # once the shock is a few widths out it must track R ~ t^{2/5}.
    measured = []
    for _ in range(90):
        state, diag = step(state)
        t = float(diag.ttot)
        if shock_radius(t, 1.0, 1.0, cfg.gamma) > 0.4:
            break  # stop before periodic images contaminate the profile
        if t > 0.015 and len(measured) < 100:
            ps = state.p
            # density via VE normalization on current state
            _, _, aux = compute_forces_ve(ps, box, grid, cfg, state.dt)
            rs, rho_pk = shock_radius_from_density(
                ps.x, ps.y, ps.z, aux["rho"], nbins=48, rmax=0.5)
            measured.append((t, rs, rho_pk))

    assert len(measured) >= 3
    ts = np.array([m[0] for m in measured])
    rs = np.array([m[1] for m in measured])
    expected = shock_radius(ts, E=1.0, rho0=1.0, gamma=cfg.gamma)
    rel = np.abs(rs - expected) / expected
    # low resolution + binning: generous tolerance
    assert rel.mean() < 0.15, (rs, expected)

    # compression approaches (gamma+1)/(gamma-1) = 4 (smeared by SPH)
    rho_pk = measured[-1][2]
    assert rho_pk > 1.8, rho_pk

    # L1 density-profile error vs the exact self-similar solution
    # (reference acceptance metric: compare_solutions.py computeL1Error;
    # 24^3 with fp32 + SPH smoothing => generous threshold)
    t_end = float(state.ttot)
    ps = state.p
    _, _, aux = compute_forces_ve(ps, box, grid, cfg, state.dt)
    centers, rho_sim, counts = radial_profile(ps.x, ps.y, ps.z, aux["rho"],
                                              nbins=32, rmax=0.5)
    rho_ana, _, _ = sedov_profile(centers, t_end, E=1.0, rho0=1.0,
                                  gamma=cfg.gamma)
    ok = counts > 3
    err = l1_error(rho_sim[ok], rho_ana[ok])
    # dominated by SPH smearing of the shock front at 24^3
    assert err < 0.35, err
