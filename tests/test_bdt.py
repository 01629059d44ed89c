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
