"""Block time-steps vs the global-dt resident engine (reference:
ve_hydro_bdt.hpp acceptance idea — rung run must match the global run
within tolerance while doing measurably less pair work)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.ops.cellmajor import CMGrid
from sphexa_tpu.propagator.ve_bdt import BdtVE
from sphexa_tpu.propagator.ve_pallas import ResidentVE


@pytest.mark.slow
def test_bdt_matches_global_dt():
    cfg = SphConfig(cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(10, cfg, dt0=2e-4)
    grid = CMGrid(n=4, cap=128)

    # global-dt reference trajectory (keep (t, eint, ecin) samples)
    eng = ResidentVE(box, grid, cfg, interpret=True)
    rst = eng.bind(state)
    traj = []
    for _ in range(10):
        rst, dg = eng.step(rst)
        traj.append((float(dg.ttot), float(dg.eint), float(dg.ecin)))
    t_end = traj[6][0]

    # BDT: run whole cycles until the same simulation time
    # (fresh init: the global engine's donated buffers alias `state`)
    state2, _, _ = init_sedov(10, cfg, dt0=2e-4)
    bdt = BdtVE(box, grid, cfg, num_rungs=3, interpret=True)
    bst = bdt.bind_bdt(state2)
    diags = []
    while float(bst.rv.ttot) < t_end:
        bst, ds = bdt.run_cycle(bst)
        diags += ds
        assert len(diags) < 400  # safety

    d_last = diags[-1]
    assert int(d_last.overflow) == 0
    # physics agreement at the matched time (interpolate the global run)
    tb = float(d_last.ttot)
    ts_, ei_, ec_ = (np.array(c) for c in zip(*traj))
    assert ts_[0] <= tb <= ts_[-1], (tb, ts_[0], ts_[-1])
    eint_ref = np.interp(tb, ts_, ei_)
    ecin_ref = np.interp(tb, ts_, ec_)
    np.testing.assert_allclose(float(d_last.eint), eint_ref, rtol=2e-3)
    rel_ecin = abs(float(d_last.ecin) - ecin_ref) / max(ecin_ref, 1e-12)
    assert rel_ecin < 0.10, (float(d_last.ecin), ecin_ref)

    # energy conservation within the BDT run itself
    e0 = float(diags[0].etot)
    assert abs(float(d_last.etot) - e0) / e0 < 1e-3

    # measurably less work: on the Sedov blast only the hot center sits
    # on rung 0 -> later substeps must skip cells
    fr = [float(d.active_cell_frac) for d in diags]
    hist = np.asarray(diags[-1].rung_hist)
    assert min(fr) < 0.7, fr           # some substeps skip >30% of cells
    assert (hist > 0).sum() >= 2, hist  # at least two occupied rungs
    mean_active = float(np.mean([float(d.active_frac) for d in diags]))
    print(f"mean active fraction {mean_active:.2f}, rung hist {hist}")
    assert mean_active < 0.95


@pytest.mark.medium
def test_bdt_gravity_matches_plain():
    """BDT x gravity (reference: ve_hydro_bdt.hpp:277-288 recomputes
    gravity for the active rungs every substep). With num_rungs=1 a
    BDT cycle IS one all-active step, so it must reproduce the plain
    resident engine with gravity exactly (same pipeline + same solver
    + same dt candidates incl. the acceleration limit)."""
    from sphexa_tpu.init.evrard import init_evrard
    from sphexa_tpu.ops.cellmajor import choose_cap_and_grid
    from sphexa_tpu.propagator.ve_pallas import ResidentVE

    cfg = SphConfig(chunk=512, cell_cap=512, ngpad=256,
                    gravity_solver="direct")
    state, box, cfg = init_evrard(10, cfg, dt0=1e-4)
    cfg = cfg.replace(gravity_solver="direct")
    assert cfg.gravG != 0.0
    p = state.p
    alive = np.asarray(p.alive)
    cap, grid = choose_cap_and_grid(
        box, float(np.asarray(p.h)[alive].max()) * 1.2, int(alive.sum()),
        np.asarray(p.x)[alive], np.asarray(p.y)[alive],
        np.asarray(p.z)[alive], cap_min=32, cap_max=512)

    # BDT arm first: the plain engine's donated step invalidates the
    # state buffers its bind aliased (dt/ttot ride into the carry)
    bdt = BdtVE(box, grid, cfg, num_rungs=1, interpret=True)
    bst = bdt.bind_bdt(state)
    diags = []
    for _ in range(2):
        bst, ds = bdt.run_cycle(bst)
        diags += ds
    db = diags[-1]

    plain = ResidentVE(box, grid, cfg, interpret=True)
    rst = plain.bind(state)
    for _ in range(2):
        rst, dp = plain.step(rst)

    assert int(db.overflow) == 0
    np.testing.assert_allclose(float(db.dt), float(dp.dt), rtol=1e-5)
    np.testing.assert_allclose(float(db.eint), float(dp.eint), rtol=1e-5)
    np.testing.assert_allclose(float(db.ecin), float(dp.ecin), rtol=1e-3,
                               atol=1e-10)
    # etot includes egrav on both sides
    np.testing.assert_allclose(float(db.etot), float(dp.etot), rtol=1e-4)
    # per-slot positions agree (same layout after the first resync)
    np.testing.assert_allclose(np.asarray(bst.rv.x), np.asarray(rst.x),
                               rtol=0, atol=5e-6)
