"""Evrard / Gresho-Chan L1 comparators (reference:
main/src/analytical_solutions/compare_evrard.py, compare_gresho_chan.py)
— comparator machinery unit tests plus a Gresho end-to-end gate."""

import numpy as np
import pytest

from sphexa_tpu.config import SphConfig


def test_evrard_solution_tables_sane():
    from sphexa_tpu.observables import evrard_solution as ev

    for kind in ("rho", "p", "vr"):
        for t in ev.T_SOLUTIONS:
            r, y, ts = ev.solution(kind, t)
            assert ts == t
            # non-decreasing: shock jumps are digitized as duplicate radii
            assert (np.diff(r) >= 0).all()
            assert len(r) >= 10
    # density at t=0.77: steep central profile, ~2700 at r~0.0017
    r, y, _ = ev.solution("rho", 0.77)
    assert y[0] > 2000 and y[-1] < 1e-3


def test_evrard_l1_machinery():
    from sphexa_tpu.observables import evrard_solution as ev

    r, y, _ = ev.solution("rho", 0.77)
    # perfect profile -> ~0 error; 2x profile -> ~1.0 relative L1
    assert ev.l1_error(r, y, "rho", 0.77) < 1e-6
    assert abs(ev.l1_error(r, 2 * y, "rho", 0.77) - 1.0) < 1e-6


def test_gresho_analytic_profile():
    from sphexa_tpu.observables.gresho_solution import analytic_vt, l1_error

    assert analytic_vt(0.1) == pytest.approx(0.5)
    assert analytic_vt(0.2) == pytest.approx(1.0)
    assert analytic_vt(0.3) == pytest.approx(0.5)
    assert analytic_vt(0.5) == 0.0
    r = np.linspace(0.01, 0.6, 100)
    assert l1_error(r, analytic_vt(r)) < 1e-12


@pytest.mark.slow
def test_gresho_chan_e2e_l1():
    """Short Gresho-Chan run: the SPH vortex must track the analytic
    triangular profile (acceptance metric = the reference's velocity L1,
    compare_gresho_chan.py:79)."""
    from sphexa_tpu.init.factory import make_initializer
    from sphexa_tpu.neighbors import CellGrid, choose_level
    from sphexa_tpu.observables.gresho_solution import (l1_error,
                                                        tangential_velocity)
    from sphexa_tpu.propagator.ve import make_ve_step

    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = make_initializer("gresho-chan")(12, cfg, dt0=1e-3)
    alive = np.asarray(state.p.alive)
    h0 = float(np.asarray(state.p.h)[alive].max())
    step = make_ve_step(box, CellGrid(choose_level(box, h0 * 1.3)), cfg)

    radii0, vt0 = tangential_velocity(
        np.asarray(state.p.x)[alive], np.asarray(state.p.y)[alive],
        np.asarray(state.p.vx)[alive], np.asarray(state.p.vy)[alive])
    l1_init = l1_error(radii0, vt0)

    for _ in range(5):
        state, diag = step(state)
    alive = np.asarray(state.p.alive)
    radii, vt = tangential_velocity(
        np.asarray(state.p.x)[alive], np.asarray(state.p.y)[alive],
        np.asarray(state.p.vx)[alive], np.asarray(state.p.vy)[alive])
    l1 = l1_error(radii, vt)
    # the discretized vortex starts with a finite L1 (profile sampling);
    # a short stable run must not degrade it appreciably
    assert np.isfinite(float(diag.etot))
    assert l1 < max(2.0 * l1_init, 0.05), (l1, l1_init)
