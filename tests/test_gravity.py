"""Gravity: direct sum vs fp64 oracle + Evrard collapse smoke
(reference analog: ryoanji/test/nbody/direct.cu, traversal_cpu.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.gravity.direct import direct_gravity, egrav
from sphexa_tpu.init.evrard import init_evrard
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.propagator.ve import make_ve_step


def test_direct_gravity_vs_oracle():
    rng = np.random.default_rng(8)
    n = 300
    x, y, z = (rng.uniform(-1, 1, n) for _ in range(3))
    m = rng.uniform(0.5, 1.5, n) / n
    eps = 0.01

    g = direct_gravity(*[jnp.asarray(v, jnp.float32) for v in (x, y, z, m)],
                       jnp.ones(n, bool), G=2.0, eps=eps, chunk=128)

    # fp64 oracle
    rx = x[:, None] - x[None, :]
    ry = y[:, None] - y[None, :]
    rz = z[:, None] - z[None, :]
    r2 = rx**2 + ry**2 + rz**2 + eps**2
    inv_r = 1.0 / np.sqrt(r2)
    np.fill_diagonal(inv_r, 0.0)
    inv_r3 = inv_r**3
    ax = -2.0 * np.sum(m[None, :] * inv_r3 * rx, axis=1)
    pot = -2.0 * np.sum(m[None, :] * inv_r, axis=1)

    scale = np.abs(ax).max()
    assert np.abs(np.asarray(g.ax) - ax).max() / scale < 1e-5
    assert np.abs(np.asarray(g.pot) - pot).max() / np.abs(pot).max() < 1e-5

    # momentum conservation: sum m*a = 0 (Newton's third law)
    assert abs(float(jnp.sum(jnp.asarray(m, jnp.float32) * g.ax))) < 1e-5

    # egrav symmetry with the pairwise definition
    e = float(egrav(jnp.asarray(m, jnp.float32), g.pot, jnp.ones(n, bool)))
    e_ref = 0.5 * np.sum(m * pot)
    np.testing.assert_allclose(e, e_ref, rtol=1e-5)


@pytest.mark.slow
def test_evrard_collapse():
    cfg = SphConfig(chunk=1024, cell_cap=256, ngpad=256)
    state, box, cfg = init_evrard(14, cfg)
    assert cfg.gravG == 1.0
    alive = np.asarray(state.p.alive)
    h_max = float(np.max(np.asarray(state.p.h)[alive]))
    grid = CellGrid(choose_level(box, h_max * 1.3))
    step = make_ve_step(box, grid, cfg)

    diags = []
    for _ in range(12):
        state, d = step(state)
        diags.append(d)

    assert np.isfinite(float(diags[-1].etot))
    assert float(diags[-1].egrav) < 0
    # collapse: kinetic energy grows, potential deepens
    assert float(diags[-1].ecin) > float(diags[0].ecin)
    assert float(diags[-1].egrav) <= float(diags[0].egrav) + 1e-4
    # total energy (ecin+eint+egrav) roughly conserved
    e0 = float(diags[0].etot)
    eN = float(diags[-1].etot)
    assert abs(eN - e0) / abs(e0) < 0.05
