"""BDT rung-state checkpointing (reference: sph/timestep.h:29-34
Timestep::loadOrStore) and the turbulence-ve-bdt propagator
(reference: TurbVeBdtProp, turb_ve.hpp:114-118)."""

import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.ops.cellmajor import CMGrid
from sphexa_tpu.propagator.ve_bdt import BdtVE, TurbBdtVE


def test_bdt_checkpoint_restart_preserves_rungs(tmp_path):
    """Run one cycle (populates rungs), checkpoint at the cycle
    boundary, restore into a fresh engine: the restored run must carry
    the SAME rung assignment and base dt — not silently re-derive."""
    cfg = SphConfig(cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(8, cfg, dt0=2e-4)
    grid = CMGrid(n=3, cap=256)
    bdt = BdtVE(box, grid, cfg, num_rungs=3, interpret=True)
    bst = bdt.bind_bdt(state)
    bst, diags = bdt.run_cycle(bst)
    assert int(bst.substep) == 0

    n_cap = state.p.n
    ck = bdt.checkpoint_rungs(bst, n_cap)
    assert set(ck["fields"]) == {"bdt_rung", "bdt_dt_m1k"}
    assert ck["attrs"]["bdt_num_rungs"] == 3

    # full HDF5 round-trip
    from sphexa_tpu.io.hdf5 import HDF5Writer, load_bdt_state
    st_out = bdt.unbind(bst.rv, n_cap)
    path = str(tmp_path / "bdt.h5")
    w = HDF5Writer(path)
    w.write_step(st_out, cfg, box, bdt_state=ck)
    w.close()
    loaded = load_bdt_state(path)
    assert loaded is not None and loaded["num_rungs"] == 3
    np.testing.assert_allclose(loaded["dt_min"], float(bst.dt_min))

    # restore into a freshly bound engine from the unbound state
    bdt2 = BdtVE(box, grid, cfg, num_rungs=3, interpret=True)
    bst2 = bdt2.bind_bdt(st_out)
    alive = np.asarray(st_out.p.alive)
    pad = n_cap - len(loaded["rung"])
    rung_pf = np.zeros(n_cap, np.float32)
    rung_pf[np.flatnonzero(alive)] = loaded["rung"]
    dtm_pf = np.full(n_cap, loaded["dt_min"], np.float32)
    dtm_pf[np.flatnonzero(alive)] = loaded["dt_m1k"]
    bst2 = bdt2.restore_rungs(bst2, rung_pf, dtm_pf, loaded["dt_min"])

    # the restored slot-frame rungs must match the saved ones
    v1 = np.asarray(bst.rv.valid & bdt.intmask)
    v2 = np.asarray(bst2.rv.valid & bdt2.intmask)
    gid1 = np.asarray(bst.rv.gid)[v1].astype(int)
    gid2 = np.asarray(bst2.rv.gid)[v2].astype(int)
    r1 = np.zeros(n_cap); r1[gid1] = np.asarray(bst.rung)[v1]
    r2 = np.zeros(n_cap); r2[gid2] = np.asarray(bst2.rung)[v2]
    # unbind packs alive rows, so map the saved gids through the packing
    packed_of = -np.ones(n_cap, int)
    packed_of[np.flatnonzero(alive)] = np.arange(alive.sum())
    match = (r2[packed_of[gid1]] == r1[gid1])
    assert match.mean() > 0.97, f"only {match.mean():.2%} rungs preserved"
    np.testing.assert_allclose(float(bst2.dt_min), float(bst.dt_min))


@pytest.mark.slow
def test_turbulence_bdt_cycle_runs():
    """TurbVeBdt: one full cycle on the turbulence box — stirring
    committed with the kick forces, energy injected, state finite."""
    from sphexa_tpu.init.turbulence import init_turbulence

    cfg = SphConfig(cell_cap=256, ngpad=256)
    state, box, cfg = init_turbulence(8, cfg)
    grid = CMGrid(n=3, cap=256)
    eng = TurbBdtVE(box, grid, cfg, num_rungs=2, interpret=True,
                    verbose=False)
    bst = eng.bind_bdt(state)
    e0 = None
    bst, diags = eng.run_cycle(bst)
    for d in diags:
        assert np.isfinite(float(d.etot))
        if e0 is None:
            e0 = float(d.ecin)
    assert int(diags[-1].overflow) == 0
    # stirring must inject kinetic energy from the cold start
    assert float(diags[-1].ecin) > 0.0
