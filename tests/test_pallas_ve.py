"""Pallas cell-major VE path vs the XLA gather path (interpret mode on
CPU). Full-step equivalence including h adaptation, ghost cells, and
periodic images — the strongest cross-check of the TPU fast path."""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.ops.cellmajor import CMGrid, choose_cm_grid
from sphexa_tpu.propagator.ve import make_ve_step
from sphexa_tpu.propagator.ve_pallas import make_ve_step_pallas


@pytest.mark.slow
def test_pallas_step_matches_xla():
    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(12, cfg, dt0=2e-4)
    h0 = float(state.p.h[0])

    step_x = make_ve_step(box, CellGrid(choose_level(box, h0 * 1.3)), cfg)
    step_p = make_ve_step_pallas(
        box, choose_cm_grid(box, h0 * 1.3, 12 ** 3, cap=256), cfg,
        interpret=True)

    sx, sp = state, state
    for _ in range(3):
        sx, dx = step_x(sx)
        sp, dp = step_p(sp)

    assert int(dp.max_cell_count) == 0  # no slot overflow
    np.testing.assert_allclose(float(dp.dt), float(dx.dt), rtol=1e-5)
    np.testing.assert_allclose(float(dp.eint), float(dx.eint), rtol=1e-6)
    np.testing.assert_allclose(float(dp.ecin), float(dx.ecin), rtol=1e-3,
                               atol=1e-12)

    from scipy.spatial import cKDTree
    a = {f: np.asarray(getattr(sx.p, f)) for f in ("x", "y", "z", "vx", "temp", "h")}
    b = {f: np.asarray(getattr(sp.p, f)) for f in ("x", "y", "z", "vx", "temp", "h")}
    tree = cKDTree(np.c_[a["x"], a["y"], a["z"]])
    d, j = tree.query(np.c_[b["x"], b["y"], b["z"]])
    assert d.max() < 1e-6
    assert len(np.unique(j)) == len(j)
    vscale = np.abs(a["vx"]).max()
    assert np.abs(b["vx"] - a["vx"][j]).max() / vscale < 1e-3
    assert np.abs(b["h"] - a["h"][j]).max() / a["h"].max() < 1e-5


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["gravity", "avclean"])
def test_pallas_gravity_and_avclean_match_xla(variant):
    """The Pallas path must carry the same physics extensions as the
    XLA path: self-gravity coupling (ve_hydro.hpp:195-204) and the
    avClean momentum correction (momentum_energy_kern.hpp:44-63)."""
    kw = dict(chunk=512, cell_cap=256, ngpad=256)
    if variant == "gravity":
        kw.update(gravG=1.0, gravity_solver="direct", eps=0.02)
    else:
        kw.update(av_clean=True)
    cfg = SphConfig(**kw)
    state, box, cfg = init_sedov(10, cfg, dt0=2e-4)
    h0 = float(state.p.h[0])

    step_x = make_ve_step(box, CellGrid(choose_level(box, h0 * 1.3)), cfg)
    step_p = make_ve_step_pallas(
        box, choose_cm_grid(box, h0 * 1.3, 10 ** 3, cap=256), cfg,
        interpret=True)

    sx, sp = state, state
    for _ in range(2):
        sx, dx = step_x(sx)
        sp, dp = step_p(sp)
    assert int(dp.max_cell_count) == 0
    np.testing.assert_allclose(float(dp.dt), float(dx.dt), rtol=1e-5)
    np.testing.assert_allclose(float(dp.eint), float(dx.eint), rtol=1e-6)
    np.testing.assert_allclose(float(dp.ecin), float(dx.ecin), rtol=2e-3,
                               atol=1e-12)
    if variant == "gravity":
        np.testing.assert_allclose(float(dp.egrav), float(dx.egrav),
                                   rtol=1e-4)


@pytest.mark.slow
def test_resident_engine_matches_compat():
    """The cm-frame-resident engine (no per-step layout rebuild, deferred
    periodic fold, in-graph rebin) must reproduce the per-step-rebuild
    compat path, including across a forced lax.cond rebin."""
    import jax.numpy as jnp

    from sphexa_tpu.propagator.ve_pallas import ResidentVE

    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(12, cfg, dt0=2e-4)
    h0 = float(state.p.h[0])
    grid = choose_cm_grid(box, h0 * 1.3, 12 ** 3, cap=256)

    step_c = make_ve_step_pallas(box, grid, cfg, interpret=True)
    eng = ResidentVE(box, grid, cfg, interpret=True)
    rst = eng.bind(state)
    assert int(rst.overflow) == 0

    sc = state
    for i in range(4):
        if i == 2:  # exhaust the drift margin -> forces the rebin branch
            rst = rst.replace(drift=jnp.float32(1e9))
        sc, dc = step_c(sc)
        rst, dr = eng.step(rst)
        assert int(dr.overflow) == 0
        if i == 2:
            assert bool(dr.rebinned)
        np.testing.assert_allclose(float(dr.dt), float(dc.dt), rtol=1e-5)
        np.testing.assert_allclose(float(dr.eint), float(dc.eint),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(dr.ecin), float(dc.ecin),
                                   rtol=1e-3, atol=1e-12)

    out = eng.unbind(rst, state.p.n)
    assert int(np.sum(np.asarray(out.p.alive))) == state.p.n
    for f in ("x", "y", "z", "vx", "temp", "h"):
        a = np.asarray(getattr(sc.p, f))
        b = np.asarray(getattr(out.p, f))
        scale = max(np.abs(a).max(), 1e-12)
        assert np.abs(b - a).max() / scale < 2e-3, f


@pytest.mark.medium
def test_unbind_snapshot_survives_donation():
    """bind/unbind snapshots must not alias the resident frame: steps()
    donates the frame, and an aliased scalar made an overflow-retry
    snapshot unreadable (sedov_gate crash, artifacts 2026-08-19)."""
    from sphexa_tpu.propagator.ve_pallas import ResidentVE

    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(10, cfg, dt0=2e-4)
    grid = choose_cm_grid(box, float(state.p.h[0]) * 1.3, 10 ** 3, cap=256)
    eng = ResidentVE(box, grid, cfg, interpret=True)

    rst = eng.bind(state)
    saved = eng.unbind(rst, state.p.n)        # snapshot BEFORE stepping
    rst, _ = eng.steps(rst, 2)                # donates rst's buffers
    # the snapshot (scalars AND fields) must still be readable
    assert float(saved.ttot) == float(state.ttot)
    assert np.isfinite(np.asarray(saved.p.x)).all()
    # and the original state the engine bound from must too (bind copies)
    assert float(state.ttot) == 0.0
    rst2 = eng.bind(saved)                    # retry-from-snapshot path
    rst2, d = eng.steps(rst2, 1)
    assert int(d.overflow[-1]) == 0


@pytest.mark.slow
def test_pallas_evrard_clustered_density():
    """Evrard-like h contrast (an order of magnitude core-to-edge) on
    the Pallas path: the grid is bound by the global h_max, so dense
    cells need a deep CAP — verify zero slot overflow and agreement
    with the XLA path under self-gravity (VERDICT item: clustered
    densities must not silently truncate)."""
    from sphexa_tpu.init.evrard import init_evrard

    cfg = SphConfig(chunk=512, cell_cap=1024, ngpad=256,
                    gravity_solver="direct")
    state, box, cfg = init_evrard(14, cfg, dt0=1e-3)
    alive = np.asarray(state.p.alive)
    h_arr = np.asarray(state.p.h)[alive]
    assert h_arr.max() / h_arr.min() > 2.5  # ~20x density contrast

    step_x = make_ve_step(box, CellGrid(choose_level(box, h_arr.max() * 1.3)),
                          cfg)
    grid = choose_cm_grid(box, h_arr.max() * 1.3, int(alive.sum()), cap=512)
    step_p = make_ve_step_pallas(box, grid, cfg, interpret=True)

    sx, sp = state, state
    for _ in range(2):
        sx, dx = step_x(sx)
        sp, dp = step_p(sp)
    assert int(dp.max_cell_count) == 0, "slot overflow on clustered density"
    np.testing.assert_allclose(float(dp.dt), float(dx.dt), rtol=1e-5)
    np.testing.assert_allclose(float(dp.eint), float(dx.eint), rtol=1e-5)
    np.testing.assert_allclose(float(dp.egrav), float(dx.egrav), rtol=1e-4)


@pytest.mark.medium
def test_iblock_deep_cap_matches_unblocked(monkeypatch):
    """i-row blocking (the deep-cap VMEM-stack fix: bodies process the
    center in IB-lane sub-blocks, bounding the Mosaic kernel stack at
    ~0.31 MiB * IB instead of * CAP) must not change the physics: a
    cap-256 step blocked at IB=64 matches the unblocked body. Direct
    bodies are bitwise-identical (per-i-row accumulation order is
    unchanged); only the MXU hybrid bodies shift by ulps (per-block
    expansion origin)."""
    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(10, cfg, dt0=2e-4)
    h0 = float(state.p.h[0])
    grid = choose_cm_grid(box, h0 * 1.3, 10 ** 3, cap=256)
    assert grid.cap == 256

    monkeypatch.setenv("SPHEXA_IBLOCK", "1024")   # unblocked reference
    step_u = make_ve_step_pallas(box, grid, cfg, interpret=True)
    monkeypatch.setenv("SPHEXA_IBLOCK", "64")     # 4 sub-blocks per cell
    step_b = make_ve_step_pallas(box, grid, cfg, interpret=True)

    su, sb = state, state
    for _ in range(2):
        su, du = step_u(su)
        sb, db = step_b(sb)
    assert int(db.max_cell_count) == 0
    np.testing.assert_allclose(float(db.dt), float(du.dt), rtol=1e-6)
    np.testing.assert_allclose(float(db.eint), float(du.eint), rtol=1e-7)
    np.testing.assert_allclose(float(db.ecin), float(du.ecin), rtol=1e-5,
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(sb.p.x), np.asarray(su.p.x),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sb.p.vx), np.asarray(su.p.vx),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sb.p.h), np.asarray(su.p.h),
                               rtol=1e-6)
