"""Block time-steps composed with the slab-sharded Pallas engine
(reference: ve_hydro_bdt.hpp runs rungs on the full distributed domain
with sync/partialSync, :171-212) — the sharded BDT must reproduce the
single-chip BDT up to fp reduction order: same rung assignment, same
energies, same per-particle state."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from sphexa_tpu.config import SphConfig
from sphexa_tpu.domain.slab import AXIS, SlabConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.ops.cellmajor import CMGrid
from sphexa_tpu.propagator.ve_bdt import BdtVE
from sphexa_tpu.propagator.ve_bdt_sharded import ShardedBdtVE


@pytest.mark.multichip
@pytest.mark.slow
@pytest.mark.medium
@pytest.mark.parametrize("D", [2, 4])
def test_bdt_sharded_matches_single(D):
    cfg = SphConfig(cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(10, cfg, dt0=2e-4)
    n = 10 ** 3
    grid1 = CMGrid(n=4, cap=128)           # global 4x4x4 cells

    bdt1 = BdtVE(box, grid1, cfg, num_rungs=3, interpret=True)
    bst1 = bdt1.bind_bdt(state)
    diags1 = []
    for _ in range(2):
        bst1, ds = bdt1.run_cycle(bst1)
        diags1 += ds

    state2, _, _ = init_sedov(10, cfg, dt0=2e-4)
    mesh = Mesh(np.array(jax.devices()[:D]), (AXIS,))
    gridL = CMGrid(n=4, cap=128, nzi=4 // D)  # same global cells, split
    sc = SlabConfig(n_slabs=D, cap=(n // D) * 2 + 64, halo_cap=8,
                    mig_cap=128)
    bdtN = ShardedBdtVE(box, gridL, cfg, sc, mesh, num_rungs=3,
                        interpret=True)
    bstN = bdtN.distribute_bind(state2)
    diagsN = []
    for _ in range(2):
        bstN, ds = bdtN.run_cycle(bstN)
        diagsN += ds

    # same rung structure (integer counts must agree EXACTLY) and
    # substep-by-substep agreement of the scalar trajectory
    for d1, dN in zip(diags1, diagsN):
        np.testing.assert_array_equal(np.asarray(d1.rung_hist),
                                      np.asarray(dN.rung_hist))
        np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-5)
        np.testing.assert_allclose(float(dN.eint), float(d1.eint),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(dN.ecin), float(d1.ecin),
                                   rtol=5e-4, atol=1e-10)
        np.testing.assert_allclose(float(dN.active_frac),
                                   float(d1.active_frac), atol=1e-6)
    assert int(diagsN[-1].overflow) == 0

    # per-particle state agreement at the cycle boundary
    s1 = bdt1.unbind(bst1.rv, state.p.n)
    alive1 = np.asarray(s1.p.alive)
    sel = np.flatnonzero(np.asarray(state.p.alive))
    sN = bdtN.unbind(bstN, len(sel))
    for f in ("x", "y", "z", "vx", "vy", "vz", "temp", "h"):
        a = np.asarray(getattr(s1.p, f))[sel]
        b = np.asarray(getattr(sN.p, f))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=5e-5 * scale, rtol=1e-3,
                                   err_msg=f)

    # the BDT win survives sharding: later substeps skip cells
    fr = [float(d.active_cell_frac) for d in diagsN]
    assert min(fr) < 0.7, fr


@pytest.mark.multichip
@pytest.mark.slow
@pytest.mark.medium
def test_bdt_sharded_gravity_matches_single():
    """The production composition of ve_hydro_bdt.hpp:171-288: domain
    decomposition x block time-steps x SELF-GRAVITY. The sharded
    substep's gravity hook runs the hierarchical cross-rank FMM
    (psum'd moment grid + ppermute near-field bands); it must match
    the single-chip BDT whose substep runs the local conv-FMM on the
    full frame — same solver math, different exchange."""
    D = 2
    cfg = SphConfig(cell_cap=256, ngpad=256, gravG=1.0,
                    gravity_solver="fmm", eps=0.05)
    state, box, cfg = init_sedov(10, cfg, dt0=2e-4)
    cfg = cfg.replace(gravG=1.0, gravity_solver="fmm", eps=0.05)
    n = 10 ** 3
    grid1 = CMGrid(n=4, cap=128)

    bdt1 = BdtVE(box, grid1, cfg, num_rungs=3, interpret=True)
    bst1 = bdt1.bind_bdt(state)
    diags1 = []
    for _ in range(2):
        bst1, ds = bdt1.run_cycle(bst1)
        diags1 += ds

    state2, _, _ = init_sedov(10, cfg, dt0=2e-4)
    mesh = Mesh(np.array(jax.devices()[:D]), (AXIS,))
    gridL = CMGrid(n=4, cap=128, nzi=4 // D)
    sc = SlabConfig(n_slabs=D, cap=(n // D) * 2 + 64, halo_cap=8,
                    mig_cap=128)
    bdtN = ShardedBdtVE(box, gridL, cfg, sc, mesh, num_rungs=3,
                        interpret=True)
    bstN = bdtN.distribute_bind(state2)
    diagsN = []
    for _ in range(2):
        bstN, ds = bdtN.run_cycle(bstN)
        diagsN += ds
    assert int(diagsN[-1].overflow) == 0

    for d1, dN in zip(diags1, diagsN):
        np.testing.assert_array_equal(np.asarray(d1.rung_hist),
                                      np.asarray(dN.rung_hist))
        np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-5)
        # etot includes egrav on both sides (solver-exchange parity)
        np.testing.assert_allclose(float(dN.etot), float(d1.etot),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(dN.eint), float(d1.eint),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(dN.ecin), float(d1.ecin),
                                   rtol=5e-4, atol=1e-10)

    s1 = bdt1.unbind(bst1.rv, state.p.n)
    sel = np.flatnonzero(np.asarray(state.p.alive))
    sN = bdtN.unbind(bstN, len(sel))
    for f in ("x", "y", "z", "vx", "vy", "vz", "temp", "h"):
        a = np.asarray(getattr(s1.p, f))[sel]
        b = np.asarray(getattr(sN.p, f))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=8e-5 * scale, rtol=1e-3,
                                   err_msg=f)


@pytest.mark.multichip
@pytest.mark.slow
def test_bdt_sharded_rung_restore_roundtrip():
    """Checkpoint/restore of the rung assignment across a sharded
    rebuild (reference: timestep.h:29-34 loadOrStore persists the
    Timestep struct so a restarted run resumes the SAME rungs)."""
    D = 2
    cfg = SphConfig(cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(10, cfg, dt0=2e-4)
    n = 10 ** 3
    mesh = Mesh(np.array(jax.devices()[:D]), (AXIS,))
    sc = SlabConfig(n_slabs=D, cap=(n // D) * 2 + 64, halo_cap=8,
                    mig_cap=128)

    bdt = ShardedBdtVE(box, CMGrid(n=4, cap=128, nzi=4 // D), cfg, sc,
                       mesh, num_rungs=3, interpret=True)
    bst = bdt.distribute_bind(state)
    bst, _ = bdt.run_cycle(bst)
    ck = bdt.checkpoint_rungs(bst, n)
    r0 = np.asarray(ck["fields"]["bdt_rung"])
    assert set(np.unique(r0)) > {0.0}

    # same-frame restore (layout unchanged): must be EXACT
    bst1 = bdt.restore_rungs(bst, ck["fields"]["bdt_rung"],
                             ck["fields"]["bdt_dt_m1k"],
                             ck["attrs"]["bdt_dt_min"])
    ck1 = bdt.checkpoint_rungs(bst1, n)
    np.testing.assert_array_equal(np.asarray(ck1["fields"]["bdt_rung"]),
                                  r0)

    # restart path: fresh engine + distribution from the checkpointed
    # state. Particles sitting exactly on cell boundaries may re-bin
    # into a neighboring cell, and the per-cell min-harmonization then
    # drags that cell's rung DOWN — conservative (more recompute, same
    # physics), never up. So: dt state exact, rungs never raised, and
    # the assignment substantially preserved.
    state2 = bdt.unbind(bst, n)
    bdt2 = ShardedBdtVE(box, CMGrid(n=4, cap=128, nzi=4 // D), cfg, sc,
                        mesh, num_rungs=3, interpret=True)
    bst2 = bdt2.distribute_bind(state2)
    bst2 = bdt2.restore_rungs(bst2, ck["fields"]["bdt_rung"],
                              ck["fields"]["bdt_dt_m1k"],
                              ck["attrs"]["bdt_dt_min"])
    ck2 = bdt2.checkpoint_rungs(bst2, n)
    r2 = np.asarray(ck2["fields"]["bdt_rung"])
    assert (r2 <= r0).all(), "restore must never RAISE a rung"
    assert (r2 == r0).mean() > 0.5
    np.testing.assert_allclose(np.asarray(ck2["fields"]["bdt_dt_m1k"]),
                               np.asarray(ck["fields"]["bdt_dt_m1k"]),
                               rtol=1e-6)
    assert float(bst2.dt_min) == float(ck["attrs"]["bdt_dt_min"])


@pytest.mark.multichip
@pytest.mark.slow
@pytest.mark.medium
def test_turb_bdt_sharded_matches_single():
    """The COMPLETE production composition (reference: TurbVeBdtProp
    under MPI, turb_ve.hpp:114-118): domain decomposition x block
    time-steps x turbulence stirring. Both engines seed the same OU
    sequence (rngSeed constant), so the sharded run — phases broadcast
    replicated into every rank's substep — must track the single-chip
    TurbBdtVE trajectory."""
    from sphexa_tpu.init.turbulence import init_turbulence
    from sphexa_tpu.propagator.ve_bdt import TurbBdtVE
    from sphexa_tpu.propagator.ve_bdt_sharded import TurbShardedBdtVE

    D = 2
    cfg = SphConfig(cell_cap=256, ngpad=256)
    state, box, cfg = init_turbulence(10, cfg)
    n = 10 ** 3

    bdt1 = TurbBdtVE(box, CMGrid(n=4, cap=128), cfg, num_rungs=3,
                     interpret=True)
    bst1 = bdt1.bind_bdt(state)
    diags1 = []
    for _ in range(2):
        bst1, ds = bdt1.run_cycle(bst1)
        diags1 += ds

    state2, _, _ = init_turbulence(10, cfg)
    mesh = Mesh(np.array(jax.devices()[:D]), (AXIS,))
    sc = SlabConfig(n_slabs=D, cap=(n // D) * 2 + 64, halo_cap=512,
                    mig_cap=256)
    bdtN = TurbShardedBdtVE(box, CMGrid(n=4, cap=128, nzi=4 // D), cfg,
                            sc, mesh, num_rungs=3, interpret=True)
    bstN = bdtN.distribute_bind(state2)
    diagsN = []
    for _ in range(2):
        bstN, ds = bdtN.run_cycle(bstN)
        diagsN += ds
    assert int(diagsN[-1].overflow) == 0

    for d1, dN in zip(diags1, diagsN):
        np.testing.assert_array_equal(np.asarray(d1.rung_hist),
                                      np.asarray(dN.rung_hist))
        np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-5)
        np.testing.assert_allclose(float(dN.eint), float(d1.eint),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(dN.ecin), float(d1.ecin),
                                   rtol=5e-4, atol=1e-10)

    # the stirring actually did something (field picked up kinetic
    # energy from rest) AND both sides agree on it
    assert float(diagsN[-1].ecin) > 0.0

    s1 = bdt1.unbind(bst1.rv, state.p.n)
    sel = np.flatnonzero(np.asarray(state.p.alive))
    sN = bdtN.unbind(bstN, len(sel))
    for f in ("x", "y", "z", "vx", "vy", "vz", "temp", "h"):
        a = np.asarray(getattr(s1.p, f))[sel]
        b = np.asarray(getattr(sN.p, f))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=8e-5 * scale, rtol=1e-3,
                                   err_msg=f)
