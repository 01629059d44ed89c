"""Two-tier (h-band) cell-major engine for clustered density contrast
(the TPU stand-in for the reference's adaptive focused octree,
focus/octree_focus_mpi.hpp:51). Checks: tier construction keeps caps
bounded on Evrard's 1/r profile; the theta-band exclusion audit is
clean; and the tiered step reproduces the XLA gather path."""

import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.evrard import init_evrard
from sphexa_tpu.propagator.ve_tiered import (audit_tiers, choose_tiers,
                                             make_ve_step_pallas_tiered,
                                             tier_support_bound)


def _evrard(side):
    cfg = SphConfig(chunk=512, cell_cap=512, ngpad=256, gravG=0.0)
    state, box, cfg = init_evrard(side, cfg, dt0=1e-4)
    cfg = cfg.replace(gravG=0.0)
    return state, box, cfg


def test_choose_tiers_bounds_caps():
    state, box, cfg = _evrard(20)
    p = state.p
    alive = np.asarray(p.alive)
    tiers = choose_tiers(box, p.x, p.y, p.z, p.h, alive=alive, cap_max=128)
    assert len(tiers) >= 2, "Evrard contrast should force multiple tiers"
    h = np.asarray(p.h)[alive]
    for t in tiers:
        assert t.grid.cap <= 128
        # the tier's grid must serve its own h range
        assert min(t.h_hi, h.max()) <= tier_support_bound(t) * 1.0001
    # coverage: every h belongs to exactly one tier
    owners = np.zeros(h.shape, int)
    for t in tiers:
        owners += ((h >= t.h_lo) & (h < t.h_hi)).astype(int)
    assert (owners == 1).all()


def test_band_audit_clean_on_evrard():
    state, box, cfg = _evrard(20)
    p = state.p
    alive = np.asarray(p.alive)
    tiers = choose_tiers(box, p.x, p.y, p.z, p.h, alive=alive, cap_max=128)
    v = audit_tiers(tiers, box, p.x, p.y, p.z, p.h, alive=alive)
    assert v == 0, f"{v} excluded particles inside an in-tier 2h support"


def test_band_audit_catches_violation():
    """Force an impossible band (theta tiny -> frames drop true
    neighbors) and check the audit reports it — the fail-stop works."""
    state, box, cfg = _evrard(20)
    p = state.p
    alive = np.asarray(p.alive)
    tiers = choose_tiers(box, p.x, p.y, p.z, p.h, alive=alive, cap_max=128)
    if len(tiers) < 2:
        pytest.skip("needs >= 2 tiers")
    import dataclasses
    bad = [dataclasses.replace(t, cutoff=t.h_lo * 1.5) if t.cutoff > 0 else t
           for t in tiers]
    assert audit_tiers(bad, box, p.x, p.y, p.z, p.h, alive=alive) > 0


@pytest.mark.slow
def test_tiered_step_matches_uniform_pallas():
    """The tiered step must reproduce the uniform deep-CAP Pallas
    result (identical kernels; tiering only changes the candidate
    streaming) per particle, and the XLA path at the energy level (the
    r2 clustered-density gate tolerance — per-particle XLA parity on
    Evrard is limited by h-controller differences on the open-boundary
    edge shell, see test_pallas_evrard_clustered_density)."""
    from sphexa_tpu.neighbors import CellGrid, choose_level
    from sphexa_tpu.ops.cellmajor import choose_cap_and_grid
    from sphexa_tpu.propagator.ve import make_ve_step
    from sphexa_tpu.propagator.ve_pallas import make_ve_step_pallas

    state, box, cfg = _evrard(20)
    p = state.p
    alive = np.asarray(p.alive)
    h_arr = np.asarray(p.h)[alive]
    tiers = choose_tiers(box, p.x, p.y, p.z, p.h, alive=alive, cap_max=128)
    assert len(tiers) >= 2
    assert audit_tiers(tiers, box, p.x, p.y, p.z, p.h, alive=alive) == 0

    cap_u, grid_u = choose_cap_and_grid(
        box, float(h_arr.max()), int(alive.sum()),
        np.asarray(p.x)[alive], np.asarray(p.y)[alive],
        np.asarray(p.z)[alive], cap_min=32, cap_max=1024)
    assert cap_u > 128, "uniform cap must exceed the tiered budget here"
    step_u = make_ve_step_pallas(box, grid_u, cfg, interpret=True)
    step_x = make_ve_step(box, CellGrid(choose_level(box, h_arr.max()
                                                     * 1.25)), cfg)
    step_t = make_ve_step_pallas_tiered(box, tiers, cfg, interpret=True)

    su, st, sx = state, state, state
    for _ in range(2):
        su, du = step_u(su)
        st, dt = step_t(st)
        sx, dx = step_x(sx)

    assert int(dt.max_cell_count) == 0   # no overflow / unowned / clamped
    np.testing.assert_allclose(float(dt.dt), float(du.dt), rtol=1e-5)
    np.testing.assert_allclose(float(dt.eint), float(dx.eint), rtol=1e-5)
    np.testing.assert_allclose(float(dt.ecin), float(du.ecin), rtol=1e-3,
                               atol=1e-10)

    a = np.asarray(su.p.vx)[alive]
    b = np.asarray(st.p.vx)[alive]
    vscale = max(np.abs(a).max(), 1e-12)
    assert np.abs(b - a).max() / vscale < 2e-3
    np.testing.assert_allclose(np.asarray(st.p.h)[alive],
                               np.asarray(su.p.h)[alive], rtol=1e-4)


@pytest.mark.medium
def test_tiered_resident_matches_rebuild():
    """The persistent-layout tiered step (incremental focus-tree
    analog, octree_focus_mpi.hpp:138-176) must reproduce the
    rebuild-every-step cadence: same kernels, same candidate
    completeness (drift margin), only the binning cadence differs — so
    physics agrees to fp reduction order, and the carried layouts must
    actually persist (rebuild counter stays far below the step count).

    The reference arm is the SAME jitted program with drift forced
    past the margin before every call (stale -> in-graph rebuild, the
    non-resident cadence; the tiered body itself is validated against
    uniform Pallas + XLA in test_tiered_step_matches_uniform_pallas).
    One program on purpose: running a second big-constant jitted
    program in the same process trips an XLA-CPU executable-reuse
    failure ("Execution supplied N buffers but compiled program
    expected M", jax 0.9.0, multi-device CPU backend) — see
    docs/DESIGN.md."""
    import jax.numpy as jnp

    from sphexa_tpu.propagator.ve_tiered import (
        TieredCarry, make_ve_step_pallas_tiered_resident)

    state, box, cfg = _evrard(20)
    p = state.p
    alive = np.asarray(p.alive)
    tiers = choose_tiers(box, p.x, p.y, p.z, p.h, alive=alive,
                         cap_max=176, grid_slack=1.1)
    assert len(tiers) >= 2
    assert audit_tiers(tiers, box, p.x, p.y, p.z, p.h, alive=alive) == 0

    bind, step_r = make_ve_step_pallas_tiered_resident(
        box, tiers, cfg, interpret=True)
    steps = 4

    ref = bind(state)
    for _ in range(steps):
        ref = TieredCarry(ref.state, ref.layouts, jnp.float32(1e9),
                          ref.rebuilds)
        ref, dref = step_r(ref)
    assert int(ref.rebuilds) == steps     # every step rebuilt

    carry = bind(state)
    for _ in range(steps):
        carry, dr = step_r(carry)

    # by late steps the cloud-edge h growth hits the tier bound and is
    # clamp-counted — IDENTICALLY in both arms (the clamp depends on
    # the h controller, not the binning cadence); production re-tiers
    # on any nonzero value, the equivalence here is that the cadences
    # agree on when/how much
    assert int(dr.max_cell_count) == int(dref.max_cell_count)
    # residency: the layouts persisted (at most the initial re-check)
    assert int(carry.rebuilds) < steps, int(carry.rebuilds)
    np.testing.assert_allclose(float(dr.dt), float(dref.dt), rtol=1e-5)
    np.testing.assert_allclose(float(dr.eint), float(dref.eint),
                               rtol=1e-5)
    np.testing.assert_allclose(float(dr.ecin), float(dref.ecin),
                               rtol=1e-3, atol=1e-10)
    a = np.asarray(ref.state.p.vx)[alive]
    b = np.asarray(carry.state.p.vx)[alive]
    vscale = max(np.abs(a).max(), 1e-12)
    assert np.abs(b - a).max() / vscale < 2e-3
    np.testing.assert_allclose(np.asarray(carry.state.p.h)[alive],
                               np.asarray(ref.state.p.h)[alive],
                               rtol=2e-3)


def _periodic_cluster(side=20):
    """The (audit-clean, h-continuous) Evrard 1/r cloud scaled to 45%
    and rolled so its center sits AT THE CORNER of a periodic [-1,1)
    box — in the unrolled frame the cluster wraps all six faces, so
    any face-clipped zoom would fail; only the rolled frame can tier
    it. A Sedov-style energy spike at the cluster center makes the
    per-particle forces LARGE (cold Evrard without gravity is
    near-equilibrium, where fp32 coordinate-quantization noise in the
    near-cancelling pair sums dominates the tiny net forces and no
    engine pair — not even XLA-vs-XLA on shifted copies of the same
    geometry — agrees per-particle)."""
    from sphexa_tpu.sfc.box import Box, Boundary
    from sphexa_tpu.sph.eos import ideal_gas_cv
    from sphexa_tpu.state import make_particles, make_state

    state, _box0, cfg = _evrard(side)
    p = state.p
    scale = 0.45

    def wrap(v):
        return np.mod(np.asarray(v) * scale + 1.0 + 1.0, 2.0) - 1.0

    x, y, z = wrap(p.x), wrap(p.y), wrap(p.z)
    xs = np.asarray(p.x) * scale
    r2 = xs ** 2 + (np.asarray(p.y) * scale) ** 2 \
        + (np.asarray(p.z) * scale) ** 2
    w = 0.1 * scale
    u = 1.0 / np.pi ** 1.5 / w ** 3 * np.exp(-r2 / w ** 2) + 1e-8
    temp = u / ideal_gas_cv(cfg.mui, cfg.gamma)
    n = len(x)
    ps = make_particles(n, n, x=x, y=y, z=z, temp=temp,
                        h=np.asarray(p.h) * scale, m=np.asarray(p.m),
                        alpha=np.asarray(p.alpha))
    box = Box.cube(-1.0, 1.0, Boundary.periodic)
    return make_state(ps, dt0=1e-6), box, cfg


@pytest.mark.medium
def test_tiered_periodic_cluster():
    """Tiering under periodic boundaries (the reference octree is
    BC-agnostic, cstone/sfc/box.hpp): a cluster wrapping the box corner
    must still get zoom tiers — the rolled frame (TierSpec.shift) makes
    it contiguous — with a clean band audit, and the tiered step must
    match the XLA reference on the periodic box."""
    from sphexa_tpu.neighbors import CellGrid, choose_level
    from sphexa_tpu.propagator.ve import make_ve_step

    from scipy.spatial import cKDTree

    state, box, cfg = _periodic_cluster()
    p = state.p
    alive = np.asarray(p.alive)
    h_arr = np.asarray(p.h)

    from sphexa_tpu.propagator.ve_tiered import choose_tiers_auto
    tiers = choose_tiers_auto(box, p.x, p.y, p.z, p.h, alive=alive,
                              cap_max=128)
    assert len(tiers) >= 2, "corner cluster must force zoom tiers"
    assert any(s != 0.0 for s in tiers[0].shift), \
        "wrapped cluster needs a nonzero roll"
    # the fine tier actually zooms (cluster is contiguous in the
    # rolled frame; unrolled its bbox would span the whole box)
    fine = tiers[-1]
    assert fine.sub.lx < 0.8 * box.lx

    step_x = make_ve_step(box, CellGrid(choose_level(box, h_arr.max()
                                                     * 1.25)), cfg)
    step_t = make_ve_step_pallas_tiered(box, tiers, cfg, interpret=True)

    st, sx = state, state
    for _ in range(2):
        st, dt = step_t(st)
        sx, dx = step_x(sx)

    assert int(dt.max_cell_count) == 0
    np.testing.assert_allclose(float(dt.dt), float(dx.dt), rtol=1e-5)
    np.testing.assert_allclose(float(dt.eint), float(dx.eint), rtol=1e-5)
    np.testing.assert_allclose(float(dt.ecin), float(dx.ecin), rtol=2e-3,
                               atol=1e-10)
    # per-particle: the XLA step cell-sorts its output, so match by
    # position (same pattern as test_hilbert_sharded_matches_single)
    a = {f: np.asarray(getattr(sx.p, f)) for f in ("x", "y", "z", "vx")}
    b = {f: np.asarray(getattr(st.p, f)) for f in ("x", "y", "z", "vx")}
    pos_b = np.c_[b["x"] - box.xmin, b["y"] - box.ymin,
                  b["z"] - box.zmin]
    pos_a = np.c_[a["x"] - box.xmin, a["y"] - box.ymin,
                  a["z"] - box.zmin]
    tree = cKDTree(np.mod(pos_a, box.lx), boxsize=[box.lx, box.ly, box.lz])
    d, j = tree.query(np.mod(pos_b, box.lx))
    assert d.max() < 1e-4
    assert len(np.unique(j)) == len(j)
    vscale = max(np.abs(a["vx"]).max(), 1e-12)
    assert np.abs(b["vx"] - a["vx"][j]).max() / vscale < 2e-3


def test_native_audit_matches_python():
    """csrc/hostgrid.c band audit == the numpy reference scan, on a
    case engineered to contain real violations."""
    from sphexa_tpu.util.native import band_audit_native

    state, box, cfg = _evrard(16)
    p = state.p
    alive = np.asarray(p.alive)
    x, y, z, h = (np.asarray(v)[alive].astype(np.float64)
                  for v in (p.x, p.y, p.z, p.h))
    med = np.median(h)
    sel_i = h >= med
    excl = h < med * 0.98          # overlaps supports -> violations
    edge = 2.0 * h[sel_i].max() * 1.05
    nx = max(1, int(box.lx / edge))
    ny = max(1, int(box.ly / edge))
    nz = max(1, int(box.lz / edge))
    v_nat = band_audit_native(x[sel_i], y[sel_i], z[sel_i], h[sel_i],
                              x[excl], y[excl], z[excl], box, nx, ny, nz)
    if v_nat is None:
        pytest.skip("no C compiler on this host")

    # numpy reference: brute force (sizes are small here)
    dx = x[excl][:, None] - x[sel_i][None, :]
    dy = y[excl][:, None] - y[sel_i][None, :]
    dz = z[excl][:, None] - z[sel_i][None, :]
    d2 = dx * dx + dy * dy + dz * dz
    hit = (d2 < (2.0 * h[sel_i][None, :]) ** 2).any(axis=1)
    assert v_nat == int(hit.sum())
    assert v_nat > 0


def test_choose_tiers_auto_ladder():
    """The adaptive (slack, theta) ladder finds an audited rung with
    h-growth headroom on the field where the fixed slack-1.1/theta-1.5
    combo is infeasible (measured on Evrard: the coarse tier's
    theta-fringe occupancy is cap-marginal at slack 1.0 — the
    tpu_queue.log 2026-08-19 'no tier with cap <= 176' failure)."""
    from sphexa_tpu.propagator.ve_tiered import (choose_tiers_auto,
                                                 tier_support_bound)
    state, box, cfg = _evrard(20)
    p = state.p
    alive = np.asarray(p.alive)
    tiers = choose_tiers_auto(box, p.x, p.y, p.z, p.h, alive=alive,
                              cap_max=128)
    assert audit_tiers(tiers, box, p.x, p.y, p.z, p.h, alive=alive) == 0
    h = np.asarray(p.h)[alive]
    for i, t in enumerate(tiers):
        # the TOP tier may spend a deeper cap (cap_max_top) on h-growth
        # headroom — its band is open from above (vacuum-edge h growth,
        # tpu_queue7.log 2026-08-19); lower tiers stay within cap_max
        assert t.grid.cap <= (384 if i == 0 else 128)
        # headroom: the support bound must exceed the band top by the
        # realized slack so per-step h growth does not clamp-fold
        # (unless the ladder fell to its tight fallback)
        assert tier_support_bound(t) >= min(t.h_hi, h.max()) * 0.999


@pytest.mark.medium
def test_split_gravity_matches_fused():
    """The split-gravity step (SPH and FMM in separate programs — the
    v5e second-combined-program workaround) must match the fused step
    exactly: same math, different program boundaries."""
    import jax.numpy as jnp

    from sphexa_tpu.propagator.ve_tiered import (choose_tiers_auto,
                                                 make_ve_step_pallas_tiered)
    state, box, cfg = _evrard(14)
    cfg = cfg.replace(gravG=1.0, gravity_solver="fmm", fmm_level=3)
    p = state.p
    alive = np.asarray(p.alive)
    tiers = choose_tiers_auto(box, p.x, p.y, p.z, p.h, alive=alive,
                              cap_max=128)
    fused = make_ve_step_pallas_tiered(box, tiers, cfg, interpret=True,
                                       split_gravity=False)
    split = make_ve_step_pallas_tiered(box, tiers, cfg, interpret=True,
                                       split_gravity=True)
    sf, ss = state, state
    for _ in range(2):
        sf, df = fused(sf)
        ss, ds = split(ss)
    assert int(df.max_cell_count) == 0 and int(ds.max_cell_count) == 0
    np.testing.assert_allclose(np.asarray(ss.p.x), np.asarray(sf.p.x),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ss.p.vx), np.asarray(sf.p.vx),
                               rtol=1e-6, atol=1e-8)
    assert float(df.egrav) == pytest.approx(float(ds.egrav), rel=1e-6)

    # the RESIDENT twin of the same workaround (three programs:
    # SPH+rebuild-cond / FMM / finish) must also match
    from sphexa_tpu.propagator.ve_tiered import (
        make_ve_step_pallas_tiered_resident)
    bind_f, step_rf = make_ve_step_pallas_tiered_resident(
        box, tiers, cfg, interpret=True, split_gravity=False)
    bind_s, step_rs = make_ve_step_pallas_tiered_resident(
        box, tiers, cfg, interpret=True, split_gravity=True)
    rf, rs = bind_f(state), bind_s(state)
    for _ in range(2):
        rf, drf = step_rf(rf)
        rs, drs = step_rs(rs)
    assert int(drf.max_cell_count) == 0 and int(drs.max_cell_count) == 0
    np.testing.assert_allclose(np.asarray(rs.state.p.x),
                               np.asarray(rf.state.p.x), rtol=0,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(rs.state.p.vx),
                               np.asarray(rf.state.p.vx), rtol=1e-6,
                               atol=1e-8)
    assert float(drf.egrav) == pytest.approx(float(drs.egrav), rel=1e-6)
