"""Hilbert load-balanced domain: unit tests for the split/owner logic
and end-to-end sharded-vs-single equivalence with load-balance and
zero-loss gates (reference analogs: domain/test/unit/domain/
domaindecomp.cpp split invariants, integration_mpi/domain_nranks.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sphexa_tpu.config import SphConfig
from sphexa_tpu.domain.hilbert import (AXIS, HilbertConfig, balance_splits,
                                       hilbert_keys, owner_of)
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.propagator.ve import make_ve_step
from sphexa_tpu.propagator.ve_hilbert import (HilbertDiag, distribute_hilbert,
                                              make_ve_step_hilbert)
from sphexa_tpu.sfc.box import Box, Boundary
from sphexa_tpu.state import SimState, _FIELDS


def test_balance_splits_quantiles():
    """Split boundaries must divide a clustered particle set into near-
    equal rank loads (reference: singleRangeSfcSplit +-1% balance; here
    the error bound is one histogram bin)."""
    rng = np.random.RandomState(0)
    n, D = 40000, 8
    # strongly clustered: 80% of particles in one octant corner
    xa = np.concatenate([rng.rand(n // 5), 0.25 * rng.rand(4 * n // 5)])
    ya = np.concatenate([rng.rand(n // 5), 0.25 * rng.rand(4 * n // 5)])
    za = np.concatenate([rng.rand(n // 5), 0.25 * rng.rand(4 * n // 5)])
    box = Box.cube(0.0, 1.0, Boundary.periodic)
    hc = HilbertConfig(n_ranks=D, cap=n, halo_cap=16, mig_cap=16)

    devices = np.array(jax.devices()[:D])
    mesh = Mesh(devices, (AXIS,))
    keys_all = hilbert_keys(box, jnp.asarray(xa, jnp.float32),
                            jnp.asarray(ya, jnp.float32),
                            jnp.asarray(za, jnp.float32))

    def f(keys, alive):
        return balance_splits(keys, alive, hc)

    keys_sh = jax.device_put(
        keys_all.reshape(D, -1), NamedSharding(mesh, P(AXIS, None)))
    alive = jnp.ones_like(keys_sh, bool)
    splits = jax.jit(jax.shard_map(
        lambda k, a: f(k[0], a[0])[None],
        mesh=mesh, in_specs=(P(AXIS, None), P(AXIS, None)),
        out_specs=P(AXIS, None), check_vma=False))(keys_sh, alive)
    splits = np.asarray(splits)[0]

    owner = np.asarray(owner_of(keys_all, jnp.asarray(splits)))
    counts = np.bincount(owner, minlength=D)
    ideal = n / D
    assert counts.max() / ideal < 1.10, counts  # <10% over ideal
    assert counts.min() / ideal > 0.90, counts
    # ownership respects key ranges
    for d in range(D):
        k = np.asarray(keys_all)[owner == d]
        assert (k >= splits[d]).all() and (k < splits[d + 1]).all()


def run_pair(side, n_devices, steps, dt0, key64=False, halo_pool=0):
    # side=16 resolves to a 2-cell grid (~512 particles/cell): cell_cap
    # must cover that or BOTH paths truncate candidates
    cfg = SphConfig(chunk=512, cell_cap=768, ngpad=256)
    state, box, cfg = init_sedov(side, cfg, dt0=dt0)
    n = side ** 3
    grid = CellGrid(choose_level(box, float(state.p.h[0]) * 1.4))

    step1 = make_ve_step(box, grid, cfg)
    s1 = state
    for _ in range(steps):
        s1, d1 = step1(s1)

    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, (AXIS,))
    hc = HilbertConfig(n_ranks=n_devices, cap=int(n / n_devices * 2.5) + 64,
                       halo_cap=int(n / n_devices * 2.0) + 64, mig_cap=256,
                       coarse=8, dilate=3, key64=key64,
                       halo_pool=halo_pool)
    host = {f: np.asarray(getattr(state.p, f)) for f in _FIELDS[:-1]}
    ps = distribute_hilbert(host, box, hc, mesh)
    sN = SimState(p=ps, ttot=state.ttot, dt=state.dt, dt_m1=state.dt_m1,
                  iteration=state.iteration)
    stepN = make_ve_step_hilbert(box, grid, cfg, hc, mesh)
    for _ in range(steps):
        sN, dN = stepN(sN)
    return s1, d1, sN, dN


@pytest.mark.multichip
@pytest.mark.parametrize(
    "n_devices,side",
    [(2, 12), pytest.param(8, 16, marks=pytest.mark.slow)])
def test_hilbert_sharded_matches_single(n_devices, side):
    steps = 4
    s1, d1, sN, dN = run_pair(side=side, n_devices=n_devices, steps=steps,
                              dt0=2e-4)
    assert float(dN.halo_frac) <= 1.0, "coarse cells narrower than r_halo"
    assert int(dN.lost) == 0
    assert int(dN.n_owned) == side ** 3
    assert float(dN.imbalance) < 1.15
    np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-4)
    np.testing.assert_allclose(float(dN.ecin), float(d1.ecin), rtol=2e-3,
                               atol=1e-7)
    np.testing.assert_allclose(float(dN.eint), float(d1.eint), rtol=1e-5)

    # per-particle cross-check (same pattern as the slab test)
    from scipy.spatial import cKDTree
    a = {f: np.asarray(getattr(s1.p, f)) for f in ("x", "y", "z", "vx")}
    alive = np.asarray(sN.p.alive)
    b = {f: np.asarray(getattr(sN.p, f))[alive]
         for f in ("x", "y", "z", "vx")}
    assert len(b["x"]) == side ** 3
    tree = cKDTree(np.c_[a["x"], a["y"], a["z"]])
    d, j = tree.query(np.c_[b["x"], b["y"], b["z"]])
    assert d.max() < 1e-5
    assert len(np.unique(j)) == len(j)
    vscale = max(np.abs(a["vx"]).max(), 1e-12)
    assert np.abs(b["vx"] - a["vx"][j]).max() / vscale < 2e-3


@pytest.mark.multichip
def test_hilbert_pooled_halos_match_single():
    """Pooled halo frame (hc.halo_pool, the findPeersMac peer-economy
    analog): the persistent extended frame holds a TOTAL halo budget
    independent of rank count instead of D per-pair bands. Physics must
    be identical to the single-chip path, with zero loss."""
    side, n_devices = 12, 2
    n = side ** 3
    # total-halo budget: generous but far below D * halo_cap
    pool = n + 256
    s1, d1, sN, dN = run_pair(side=side, n_devices=n_devices, steps=3,
                              dt0=2e-4, halo_pool=pool)
    assert int(dN.lost) == 0
    assert int(dN.n_owned) == n
    np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-4)
    np.testing.assert_allclose(float(dN.ecin), float(d1.ecin), rtol=2e-3,
                               atol=1e-7)
    np.testing.assert_allclose(float(dN.eint), float(d1.eint), rtol=1e-5)


@pytest.mark.multichip
def test_hilbert_pooled_halo_overflow_failstop():
    """A pool budget below the rank's true halo count must be COUNTED
    into the lost diagnostic (fail-stop signal), never silently
    truncated into wrong physics."""
    with pytest.raises(AssertionError):
        side = 12
        s1, d1, sN, dN = run_pair(side=side, n_devices=2, steps=1,
                                  dt0=2e-4, halo_pool=32)
        assert int(dN.lost) == 0  # the gate a production run enforces


@pytest.mark.multichip
def test_balance_splits64_beats_30bit_aliasing():
    """Level-20 keys in the domain (reference: KeyType=uint64,
    types.hpp:39-46): when a cluster is tighter than one level-10 key
    cell (box/1024 per dim), ALL its particles alias to a single 30-bit
    key and no 30-bit split can separate them — the 64-bit MSD
    radix-select splits must keep balance anyway."""
    from sphexa_tpu.domain.hilbert import balance_splits64, owner_of64
    from sphexa_tpu.sfc.hilbert64 import keys64_from_positions

    rng = np.random.RandomState(3)
    n, D = 32768, 4
    # 75% of particles inside a ball FAR smaller than box/1024
    tight = 1e-5
    xa = np.concatenate([rng.rand(n // 4),
                         0.37 + tight * rng.rand(3 * n // 4)])
    ya = np.concatenate([rng.rand(n // 4),
                         0.61 + tight * rng.rand(3 * n // 4)])
    za = np.concatenate([rng.rand(n // 4),
                         0.18 + tight * rng.rand(3 * n // 4)])
    box = Box.cube(0.0, 1.0, Boundary.periodic)
    hc = HilbertConfig(n_ranks=D, cap=n, halo_cap=16, mig_cap=16)
    devices = np.array(jax.devices()[:D])
    mesh = Mesh(devices, (AXIS,))

    x = jnp.asarray(xa, jnp.float32)
    y = jnp.asarray(ya, jnp.float32)
    z = jnp.asarray(za, jnp.float32)

    # 30-bit path: the cluster is one key -> hopeless imbalance
    keys30 = hilbert_keys(box, x, y, z)
    assert len(np.unique(np.asarray(keys30)[n // 4:])) <= 2, \
        "test setup: cluster must alias 30-bit keys"

    hi_all, lo_all = keys64_from_positions(box, x, y, z)
    # fp32 positions quantize at ~box/2^24; the cluster spans multiple
    # level-20 cells (box/2^20) but would still alias at level 10
    assert len(np.unique(np.asarray(lo_all)[n // 4:])) > 16

    def f(hi, lo, alive):
        s_hi, s_lo = balance_splits64(hi[0], lo[0], alive[0], hc)
        return s_hi[None], s_lo[None]

    hi_sh = jax.device_put(hi_all.reshape(D, -1),
                           NamedSharding(mesh, P(AXIS, None)))
    lo_sh = jax.device_put(lo_all.reshape(D, -1),
                           NamedSharding(mesh, P(AXIS, None)))
    alive = jnp.ones_like(hi_sh, bool)
    s_hi, s_lo = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(AXIS, None),) * 3,
        out_specs=(P(AXIS, None), P(AXIS, None)),
        check_vma=False))(hi_sh, lo_sh, alive)
    s_hi = jnp.asarray(np.asarray(s_hi)[0])
    s_lo = jnp.asarray(np.asarray(s_lo)[0])

    owner = np.asarray(owner_of64(hi_all, lo_all, s_hi, s_lo))
    counts = np.bincount(owner, minlength=D)
    ideal = n / D
    assert counts.max() / ideal < 1.10, counts
    assert counts.min() / ideal > 0.90, counts

    # the 30-bit path CANNOT balance this (pins the motivation)
    splits30 = np.zeros(D + 1, np.int64)
    ksort = np.sort(np.asarray(keys30).astype(np.int64))
    # best possible contiguous-range split of the aliased keys
    worst = max(np.bincount(ksort - ksort.min()).max(), 1)
    assert worst / ideal > 2.0, "cluster should overload any 30-bit range"


@pytest.mark.multichip
def test_hilbert_sharded_key64_matches_single():
    """The full Domain.sync pipeline on level-20 keys (hc.key64=True,
    the KeyType=uint64 production path): physics must match the
    single-device run exactly like the 30-bit path does."""
    s1, d1, sN, dN = run_pair(side=12, n_devices=2, steps=4, dt0=2e-4,
                              key64=True)
    assert int(dN.lost) == 0
    assert int(dN.n_owned) == 12 ** 3
    assert float(dN.imbalance) < 1.15
    np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-4)
    np.testing.assert_allclose(float(dN.ecin), float(d1.ecin), rtol=2e-3,
                               atol=1e-7)
    np.testing.assert_allclose(float(dN.eint), float(d1.eint), rtol=1e-5)
