"""FMM gravity vs direct sum (reference analog: ryoanji/test —
traversal_cpu.cpp validated against direct.cuh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sphexa_tpu.gravity.direct import direct_gravity
from sphexa_tpu.gravity.fmm import FmmConfig, fmm_gravity, _parity_offsets_exact
from sphexa_tpu.sfc.box import Box, Boundary


def test_vlist_offsets_partition():
    """Every cell pair must be handled exactly once across levels:
    at a given level, the V-list excludes the 27-neighborhood and
    includes exactly the cells whose parents are adjacent."""
    for p in [(0, 0, 0), (1, 0, 1), (1, 1, 1), (0, 1, 0)]:
        offs = _parity_offsets_exact(p)
        assert len(offs) > 100
        for d in offs:
            assert max(abs(v) for v in d) >= 2
            for di, pi in zip(d, p):
                assert -1 <= (pi + di) // 2 <= 1


@pytest.mark.parametrize("level", [3, 4])
def test_fmm_vs_direct(level):
    rng = np.random.default_rng(3)
    n = 4000
    x, y, z = (jnp.asarray(rng.uniform(-1, 1, n), jnp.float32)
               for _ in range(3))
    m = jnp.asarray(rng.uniform(0.5, 1.5, n) / n, jnp.float32)
    alive = jnp.ones(n, bool)
    box = Box.cube(-1.0, 1.0, Boundary.open)

    ref = direct_gravity(x, y, z, m, alive, G=1.0, eps=0.0, chunk=512)
    out = fmm_gravity(x, y, z, m, alive, box, G=1.0,
                      fc=FmmConfig(level=level, leaf_cap=256))

    aref = np.c_[ref.ax, ref.ay, ref.az]
    afmm = np.c_[out.ax, out.ay, out.az]
    assert np.isfinite(afmm).all()
    err = np.linalg.norm(afmm - aref, axis=1)
    anorm = np.linalg.norm(aref, axis=1)
    rms = np.sqrt((err ** 2).mean()) / np.sqrt((anorm ** 2).mean())
    # quadrupole + order-2 locals at standard 189-list separation:
    # comparable to reference Barnes-Hut at its theta=1.0 SPH default
    assert rms < 0.03, rms

    perr = np.abs(np.asarray(out.pot) - np.asarray(ref.pot)).mean() \
        / np.abs(np.asarray(ref.pot)).mean()
    assert perr < 0.006, perr


@pytest.mark.slow
def test_fmm_nonuniform_cluster():
    """Plummer-like central concentration (the gravity-relevant regime)."""
    rng = np.random.default_rng(11)
    n = 3000
    r = rng.power(0.6, n)  # concentrated radii
    th = np.arccos(rng.uniform(-1, 1, n))
    ph = rng.uniform(0, 2 * np.pi, n)
    x = jnp.asarray(r * np.sin(th) * np.cos(ph), jnp.float32)
    y = jnp.asarray(r * np.sin(th) * np.sin(ph), jnp.float32)
    z = jnp.asarray(r * np.cos(th), jnp.float32)
    m = jnp.full((n,), 1.0 / n, jnp.float32)
    alive = jnp.ones(n, bool)
    box = Box.cube(-1.0, 1.0, Boundary.open)

    ref = direct_gravity(x, y, z, m, alive, G=1.0, eps=0.01, chunk=512)
    out = fmm_gravity(x, y, z, m, alive, box, G=1.0,
                      fc=FmmConfig(level=4, leaf_cap=1024), eps=0.01)
    aref = np.c_[ref.ax, ref.ay, ref.az]
    afmm = np.c_[out.ax, out.ay, out.az]
    rms = (np.linalg.norm(afmm - aref, axis=1) ** 2).mean() ** 0.5 \
        / (np.linalg.norm(aref, axis=1) ** 2).mean() ** 0.5
    assert rms < 0.03, rms


@pytest.mark.medium
def test_min_sep_accuracy_classes():
    """min_sep is the MAC theta analog (reference evaluates a MAC per
    cell pair, ryoanji traversal; here the separation class is the
    fixed-list equivalent): widening min_sep must tighten the force
    error monotonically, with each class under its documented bound."""
    rng = np.random.default_rng(11)
    n = 3000
    # clustered: half the mass in a tight ball (the hard case for a MAC)
    xb = rng.uniform(-1, 1, (n // 2, 3))
    xc = rng.normal(0.3, 0.08, (n // 2, 3)).clip(-1, 1)
    pos = np.concatenate([xb, xc]).astype(np.float32)
    x, y, z = (jnp.asarray(pos[:, k]) for k in range(3))
    m = jnp.asarray(rng.uniform(0.5, 1.5, n) / n, jnp.float32)
    alive = jnp.ones(n, bool)
    box = Box.cube(-1.0, 1.0, Boundary.open)

    ref = direct_gravity(x, y, z, m, alive, G=1.0, eps=0.0, chunk=512)
    aref = np.c_[ref.ax, ref.ay, ref.az]
    anorm2 = (np.linalg.norm(aref, axis=1) ** 2).mean()

    rms = {}
    # leaf_cap must cover the clustered leaf occupancy or the P2P pass
    # truncates (counted in nf_truncated — itself asserted here)
    for ms, bound in ((2, 0.01), (3, 0.002)):
        out = fmm_gravity(x, y, z, m, alive, box, G=1.0,
                          fc=FmmConfig(level=3, leaf_cap=1024, min_sep=ms))
        assert int(getattr(out, "nf_truncated", 0)) == 0
        err = np.linalg.norm(np.c_[out.ax, out.ay, out.az] - aref, axis=1)
        rms[ms] = float(np.sqrt((err ** 2).mean() / anorm2))
        assert rms[ms] < bound, (ms, rms[ms])
    # tighter separation class => tighter forces
    assert rms[3] < 0.6 * rms[2], rms
