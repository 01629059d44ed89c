"""Multi-chip self-gravity (reference: the cross-rank multipole path,
ryoanji/interface/global_multipole.hpp:45): sharded runs with gravity
must match the single-device propagator."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from sphexa_tpu.config import SphConfig
from sphexa_tpu.domain.hilbert import AXIS as HAXIS, HilbertConfig
from sphexa_tpu.init.evrard import init_evrard
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.propagator.ve import make_ve_step
from sphexa_tpu.propagator.ve_hilbert import (distribute_hilbert,
                                              make_ve_step_hilbert)
from sphexa_tpu.state import SimState, _FIELDS


@pytest.mark.multichip
@pytest.mark.slow
def test_hilbert_gravity_matches_single():
    cfg = SphConfig(chunk=512, cell_cap=512, ngpad=256, gravG=1.0,
                    gravity_solver="direct", eps=0.02)
    state, box, cfg = init_evrard(10, cfg, dt0=1e-3)
    alive = np.asarray(state.p.alive)
    n = int(alive.sum())
    h_max = float(np.asarray(state.p.h)[alive].max())
    grid = CellGrid(choose_level(box, h_max * 1.3))

    step1 = make_ve_step(box, grid, cfg)
    s1 = state
    for _ in range(3):
        s1, d1 = step1(s1)

    D = 2
    mesh = Mesh(np.array(jax.devices()[:D]), (HAXIS,))
    hc = HilbertConfig(n_ranks=D, cap=state.p.n, halo_cap=state.p.n,
                       mig_cap=256, coarse=4, dilate=2)
    host = {f: np.asarray(getattr(state.p, f))[alive] for f in _FIELDS[:-1]}
    ps = distribute_hilbert(host, box, hc, mesh)
    sN = SimState(p=ps, ttot=state.ttot, dt=state.dt, dt_m1=state.dt_m1,
                  iteration=state.iteration)
    stepN = make_ve_step_hilbert(box, grid, cfg, hc, mesh)
    for _ in range(3):
        sN, dN = stepN(sN)

    assert int(dN.lost) == 0
    assert int(dN.n_owned) == n
    np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-5)
    np.testing.assert_allclose(float(dN.eint), float(d1.eint), rtol=1e-5)
    # etot includes egrav on both sides
    np.testing.assert_allclose(float(dN.etot), float(d1.etot), rtol=1e-4)
    np.testing.assert_allclose(float(dN.ecin), float(d1.ecin), rtol=3e-3,
                               atol=1e-10)


@pytest.mark.multichip
@pytest.mark.slow
@pytest.mark.parametrize("D,level,dim", [(2, 0, 2), (2, 0, 0), (8, 5, 2)])
def test_fmm_sharded_matches_single(D, level, dim):
    """Hierarchical multi-chip FMM (psum'd moment grid + ppermute
    near-field bands, gravity/fmm.fmm_gravity_sharded — the
    computeGlobalMultipoles analog, global_multipole.hpp:45) must
    reproduce the single-device conv-FMM bit-for-bit up to fp32
    reduction order, with per-device memory independent of N.

    Decomposition mirrors production: FIXED-WIDTH slabs (domain/slab.py
    bins by position), which satisfy the +-1-ring condition at
    min_level_for_bands by construction. Count-balanced slabs of a
    clustered cloud can be thinner than the near-field reach — the
    dedicated ring-violation test below pins the fail-stop for that
    case."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from sphexa_tpu.gravity.fmm import (FmmConfig, fmm_gravity,
                                        fmm_gravity_sharded,
                                        min_level_for_bands)
    from sphexa_tpu.sfc.box import Box, Boundary

    rng = np.random.default_rng(7)
    n = 3000
    # clustered cloud (1/r-ish) in an open cube
    r = rng.random(n) ** 1.5 * 0.8 + 1e-3
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos = (u.T * r).T.astype(np.float32)
    m = rng.random(n).astype(np.float32) * (1.0 / n)
    box = Box.cube(-1.0, 1.0, Boundary.open)

    fc = FmmConfig(level=level or max(4, min_level_for_bands(D)),
                   leaf_cap=512)
    g1 = fmm_gravity(jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
                     jnp.asarray(pos[:, 2]), jnp.asarray(m),
                     jnp.ones(n, bool), box, 1.0, fc, eps=0.02)
    assert int(g1.nf_truncated) == 0

    # fixed-width slabs along `dim` (the production slab binning);
    # unequal counts exercise the per-rank padding
    coord = pos[:, dim]
    edges = np.linspace(-1.0, 1.0, D + 1)
    slab = np.clip(np.searchsorted(edges, coord, side="right") - 1,
                   0, D - 1)
    splits = [np.flatnonzero(slab == k) for k in range(D)]
    cap = max(len(s_) for s_ in splits) + 7
    xs, ys, zs, ms, al = [], [], [], [], []
    for sel in splits:
        pad = cap - len(sel)
        xs.append(np.concatenate([pos[sel, 0], np.zeros(pad, np.float32)]))
        ys.append(np.concatenate([pos[sel, 1], np.zeros(pad, np.float32)]))
        zs.append(np.concatenate([pos[sel, 2], np.zeros(pad, np.float32)]))
        ms.append(np.concatenate([m[sel], np.zeros(pad, np.float32)]))
        al.append(np.concatenate([np.ones(len(sel), bool),
                                  np.zeros(pad, bool)]))

    mesh = Mesh(np.array(jax.devices()[:D]), ("gz",))
    f = shard_map(
        lambda x, y, z, mm, a: fmm_gravity_sharded(
            x, y, z, mm, a, box, 1.0, fc, 0.02, "gz", dim=dim),
        mesh=mesh,
        in_specs=(P("gz"),) * 5,
        out_specs=(P("gz"), P("gz"), P("gz"), P("gz"), P(), P()))
    ax, ay, az, pot, nf_trunc, band_ovf = f(
        jnp.asarray(np.concatenate(xs)), jnp.asarray(np.concatenate(ys)),
        jnp.asarray(np.concatenate(zs)), jnp.asarray(np.concatenate(ms)),
        jnp.asarray(np.concatenate(al)))
    assert int(nf_trunc) == 0 and int(band_ovf) == 0

    # reassemble and compare per particle
    inv = np.concatenate([np.arange(len(sel)) + k * cap
                          for k, sel in enumerate(splits)])
    back = np.argsort(np.concatenate(splits), kind="stable")
    for got, ref in ((ax, g1.ax), (ay, g1.ay), (az, g1.az),
                     (pot, g1.pot)):
        got_np = np.asarray(got)[inv][back]
        ref_np = np.asarray(ref)
        scale = np.abs(ref_np).max()
        np.testing.assert_allclose(got_np, ref_np, atol=2e-5 * scale,
                                   rtol=2e-4)


def _hilbert_split(pos, m, box, D, extra_cap=7):
    """Count-balanced Hilbert key-range partition (the production
    generic-domain decomposition, domain/hilbert.py), padded per rank."""
    import jax.numpy as jnp

    from sphexa_tpu.domain.hilbert import hilbert_keys

    keys = np.asarray(hilbert_keys(box, jnp.asarray(pos[:, 0]),
                                   jnp.asarray(pos[:, 1]),
                                   jnp.asarray(pos[:, 2])))
    order = np.argsort(keys, kind="stable")
    n = len(order)
    bounds = [int(round(n * d / D)) for d in range(D + 1)]
    splits = [order[bounds[d]:bounds[d + 1]] for d in range(D)]
    cap = max(len(s_) for s_ in splits) + extra_cap
    cols = {k: [] for k in "xyzma"}
    for sel in splits:
        pad = cap - len(sel)
        cols["x"].append(np.concatenate([pos[sel, 0],
                                         np.zeros(pad, np.float32)]))
        cols["y"].append(np.concatenate([pos[sel, 1],
                                         np.zeros(pad, np.float32)]))
        cols["z"].append(np.concatenate([pos[sel, 2],
                                         np.zeros(pad, np.float32)]))
        cols["m"].append(np.concatenate([m[sel], np.zeros(pad, np.float32)]))
        cols["a"].append(np.concatenate([np.ones(len(sel), bool),
                                         np.zeros(pad, bool)]))
    return splits, cap, {k: np.concatenate(v) for k, v in cols.items()}


@pytest.mark.multichip
@pytest.mark.slow
@pytest.mark.medium
@pytest.mark.parametrize("D", [2, 8])
def test_fmm_generic_domain_matches_single(D):
    """Generic-domain hierarchical FMM (occupancy-dilation boundary
    bands, fmm.fmm_gravity_sharded_generic — the any-shape LET analog of
    global_multipole.hpp:45) must reproduce the single-device conv-FMM
    on a count-balanced HILBERT decomposition of a clustered cloud —
    exactly the configuration whose thin central ranges defeat the
    1-D ring exchange (test_fmm_band_ring_violation_failstop). band_cap
    comes from the host-side measured-occupancy estimator
    (fmm.estimate_band_cap), exercising the production sizing path."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from sphexa_tpu.gravity.fmm import (FmmConfig, estimate_band_cap,
                                        fmm_gravity,
                                        fmm_gravity_sharded_generic)
    from sphexa_tpu.sfc.box import Box, Boundary

    rng = np.random.default_rng(11)
    n = 3000
    r = rng.random(n) ** 1.5 * 0.8 + 1e-3
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos = (u.T * r).T.astype(np.float32)
    m = rng.random(n).astype(np.float32) * (1.0 / n)
    box = Box.cube(-1.0, 1.0, Boundary.open)
    fc = FmmConfig(level=4, leaf_cap=512)

    g1 = fmm_gravity(jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
                     jnp.asarray(pos[:, 2]), jnp.asarray(m),
                     jnp.ones(n, bool), box, 1.0, fc, eps=0.02)
    assert int(g1.nf_truncated) == 0

    splits, cap, cols = _hilbert_split(pos, m, box, D)

    # host-side band sizing from the realized leaf occupancy
    nn = 1 << fc.level
    def cells(sel):
        g = np.clip(((pos[sel] + 1.0) / 2.0 * nn).astype(np.int64), 0,
                    nn - 1)
        return (g[:, 0] * nn + g[:, 1]) * nn + g[:, 2]
    band_cap = estimate_band_cap([cells(s_) for s_ in splits], fc.level,
                                 fc.min_sep)
    assert band_cap < D * cap, "estimator must beat the O(N) fallback"

    mesh = Mesh(np.array(jax.devices()[:D]), ("gd",))
    f = shard_map(
        lambda x, y, z, mm, a: fmm_gravity_sharded_generic(
            x, y, z, mm, a, box, 1.0, fc, 0.02, "gd", band_cap=band_cap),
        mesh=mesh, in_specs=(P("gd"),) * 5,
        out_specs=(P("gd"),) * 4 + (P(), P()))
    ax, ay, az, pot, nf_trunc, band_ovf = f(
        jnp.asarray(cols["x"]), jnp.asarray(cols["y"]),
        jnp.asarray(cols["z"]), jnp.asarray(cols["m"]),
        jnp.asarray(cols["a"]))
    assert int(nf_trunc) == 0 and int(band_ovf) == 0

    inv = np.concatenate([np.arange(len(sel)) + k * cap
                          for k, sel in enumerate(splits)])
    back = np.argsort(np.concatenate(splits), kind="stable")
    for got, ref in ((ax, g1.ax), (ay, g1.ay), (az, g1.az), (pot, g1.pot)):
        got_np = np.asarray(got)[inv][back]
        ref_np = np.asarray(ref)
        scale = np.abs(ref_np).max()
        np.testing.assert_allclose(got_np, ref_np, atol=2e-5 * scale,
                                   rtol=2e-4)


@pytest.mark.multichip
@pytest.mark.slow
def test_fmm_generic_band_overflow_failstop():
    """An undersized band_cap must trip the overflow counter (silent
    missing near-field sources are the failure mode it exists for)."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from sphexa_tpu.gravity.fmm import (FmmConfig,
                                        fmm_gravity_sharded_generic)
    from sphexa_tpu.sfc.box import Box, Boundary

    rng = np.random.default_rng(5)
    n = 800
    pos = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    m = np.full(n, 1.0 / n, np.float32)
    box = Box.cube(-1.0, 1.0, Boundary.open)
    fc = FmmConfig(level=3, leaf_cap=512)
    D = 4
    splits, cap, cols = _hilbert_split(pos, m, box, D)

    mesh = Mesh(np.array(jax.devices()[:D]), ("gd",))
    f = shard_map(
        lambda x, y, z, mm, a: fmm_gravity_sharded_generic(
            x, y, z, mm, a, box, 1.0, fc, 0.02, "gd", band_cap=8),
        mesh=mesh, in_specs=(P("gd"),) * 5,
        out_specs=(P("gd"),) * 4 + (P(), P()))
    *_, band_ovf = f(
        jnp.asarray(cols["x"]), jnp.asarray(cols["y"]),
        jnp.asarray(cols["z"]), jnp.asarray(cols["m"]),
        jnp.asarray(cols["a"]))
    assert int(band_ovf) > 0


def test_fmm_psum_budget_guard():
    """The dense sharded far field stops paying past level 6 (160 MB of
    psum'd moments at level 7); the guard must fail loudly at trace
    time instead (DESIGN.md: hierarchical-FMM scale ceiling)."""
    from sphexa_tpu.gravity.fmm import (FmmConfig, _check_psum_budget,
                                        moment_grid_bytes)

    _check_psum_budget(FmmConfig(level=6))
    assert moment_grid_bytes(4) == 20 * 4096 * 4
    with pytest.raises(ValueError, match="scale ceiling"):
        _check_psum_budget(FmmConfig(level=7))


@pytest.mark.multichip
@pytest.mark.slow
def test_fmm_band_ring_violation_failstop():
    """Count-balanced slabs of a clustered cloud get thinner than the
    near-field reach — the +-1 band exchange is then incomplete and
    MUST trip the ring-violation counter (silent wrong forces are the
    failure mode the counter exists for)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from sphexa_tpu.gravity.fmm import FmmConfig, fmm_gravity_sharded
    from sphexa_tpu.sfc.box import Box, Boundary

    rng = np.random.default_rng(7)
    n = 1600
    r = rng.random(n) ** 1.5 * 0.8 + 1e-3
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos = (u.T * r).T.astype(np.float32)
    m = np.full(n, 1.0 / n, np.float32)
    box = Box.cube(-1.0, 1.0, Boundary.open)
    D = 8
    fc = FmmConfig(level=4, leaf_cap=512)   # reach L/8 >> central slabs

    order = np.argsort(pos[:, 2], kind="stable")
    cap = n // D
    sl = order[: cap * D].reshape(D, cap)
    mesh = Mesh(np.array(jax.devices()[:D]), ("gz",))
    f = shard_map(
        lambda x, y, z, mm, a: fmm_gravity_sharded(
            x, y, z, mm, a, box, 1.0, fc, 0.02, "gz", dim=2),
        mesh=mesh, in_specs=(P("gz"),) * 5,
        out_specs=(P("gz"),) * 4 + (P(), P()))
    *_, band_ovf = f(
        jnp.asarray(pos[sl.ravel(), 0]), jnp.asarray(pos[sl.ravel(), 1]),
        jnp.asarray(pos[sl.ravel(), 2]), jnp.asarray(m[sl.ravel()]),
        jnp.ones(cap * D, bool))
    assert int(band_ovf) > 0, \
        "thin count-balanced slabs must trip the ring-violation counter"


@pytest.mark.multichip
@pytest.mark.slow
def test_fmm_rings_recover_thin_slabs():
    """Multi-hop band exchange: a dense central cluster squeezes three
    count-balanced slabs inside one near-field reach, so +-1 rings are
    incomplete (the violation counter fires) but rings=4 — computed
    host-side from the leaf-quantized extents of THIS configuration —
    restores exact equivalence with the single-device solver (ordered
    extents => one edge band serves every hop)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from sphexa_tpu.gravity.fmm import FmmConfig, fmm_gravity, \
        fmm_gravity_sharded
    from sphexa_tpu.sfc.box import Box, Boundary

    rng = np.random.default_rng(3)
    D, n_uni, n_cl = 8, 1000, 600
    z = np.concatenate([rng.uniform(-0.95, 0.95, n_uni),
                        rng.uniform(-0.02, 0.02, n_cl)]).astype(np.float32)
    xy = rng.uniform(-0.95, 0.95, (n_uni + n_cl, 2)).astype(np.float32)
    n = len(z)
    m = np.full(n, 1.0 / n, np.float32)
    box = Box.cube(-1.0, 1.0, Boundary.open)
    fc = FmmConfig(level=4, leaf_cap=512)

    g1 = fmm_gravity(jnp.asarray(xy[:, 0]), jnp.asarray(xy[:, 1]),
                     jnp.asarray(z), jnp.asarray(m),
                     jnp.ones(n, bool), box, 1.0, fc, eps=0.02)
    assert int(g1.nf_truncated) == 0

    order = np.argsort(z, kind="stable")
    cap = n // D
    sl = order[: cap * D].reshape(D, cap)
    mesh = Mesh(np.array(jax.devices()[:D]), ("gz",))

    def run(rings):
        f = shard_map(
            lambda x, y, zz, mm, a: fmm_gravity_sharded(
                x, y, zz, mm, a, box, 1.0, fc, 0.02, "gz", dim=2,
                rings=rings),
            mesh=mesh, in_specs=(P("gz"),) * 5,
            out_specs=(P("gz"),) * 4 + (P(), P()))
        return f(jnp.asarray(xy[sl.ravel(), 0]),
                 jnp.asarray(xy[sl.ravel(), 1]),
                 jnp.asarray(z[sl.ravel()]), jnp.asarray(m[sl.ravel()]),
                 jnp.ones(cap * D, bool))

    # rings=1 is incomplete here and MUST say so
    *_, bovf1 = run(1)
    assert int(bovf1) > 0

    ax, ay, az, pot, nft, bovf = run(4)
    assert int(nft) == 0 and int(bovf) == 0, (int(nft), int(bovf))
    ref = np.asarray(g1.ax)[sl.ravel()]
    got = np.asarray(ax)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=2e-4)
