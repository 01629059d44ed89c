"""Observables (reference analog: main/src/observables tests)."""

import numpy as np
import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.observables.case_observables import (
    kelvin_helmholtz_growth_rate, turbulence_mach_rms)
from sphexa_tpu.observables.conserved import conserved_quantities
from sphexa_tpu.observables.radial import l1_error, radial_profile
from sphexa_tpu.state import make_particles


def _uniform_ps(n=1000, seed=0, **kw):
    rng = np.random.default_rng(seed)
    base = dict(x=rng.uniform(-0.5, 0.5, n), y=rng.uniform(-0.5, 0.5, n),
                z=rng.uniform(-0.5, 0.5, n), m=np.full(n, 1.0 / n),
                temp=np.full(n, 1.0), h=np.full(n, 0.1))
    base.update(kw)
    return make_particles(n, **base)


def test_conserved_quantities():
    cfg = SphConfig()
    n = 1000
    ps = _uniform_ps(n, vx=np.full(n, 0.5))
    q = conserved_quantities(ps, cfg, egrav=-0.25)
    np.testing.assert_allclose(float(q.ecin), 0.5 * 1.0 * 0.25, rtol=1e-5)
    np.testing.assert_allclose(float(q.linmom), 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(q.etot),
                               float(q.ecin) + float(q.eint) - 0.25,
                               rtol=1e-5)


def test_mach_rms():
    cfg = SphConfig(gamma=1.001, mui=0.62)
    from sphexa_tpu.sph.eos import ideal_gas_cv
    cv = ideal_gas_cv(cfg.mui, cfg.gamma)
    # choose temp so c = 2, v = 1 -> Mach 0.5
    c_target = 2.0
    temp = c_target ** 2 / (cfg.gamma * (cfg.gamma - 1.0) * cv)
    n = 500
    ps = _uniform_ps(n, temp=np.full(n, temp), vx=np.full(n, 1.0))
    np.testing.assert_allclose(turbulence_mach_rms(ps, cfg), 0.5, rtol=1e-4)


def test_kh_growth_rate():
    cfg = SphConfig()
    n = 4000
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, n)
    y = rng.uniform(0, 1, n)
    amp = 0.02
    vy = amp * np.sin(4 * np.pi * x)
    ps = _uniform_ps(n, x=x, y=y, z=np.full(n, 0.01), vy=vy,
                     m=np.full(n, 1.0 / n))
    got = kelvin_helmholtz_growth_rate(ps, cfg, ymin=0.0, ymax=1.0)
    np.testing.assert_allclose(got, amp, rtol=0.1)


def test_radial_profile_and_l1():
    rng = np.random.default_rng(2)
    n = 20000
    r = rng.uniform(0.05, 1.0, n)
    th = np.arccos(rng.uniform(-1, 1, n))
    ph = rng.uniform(0, 2 * np.pi, n)
    x = r * np.sin(th) * np.cos(ph)
    y = r * np.sin(th) * np.sin(ph)
    z = r * np.cos(th)
    vals = 1.0 / r  # known radial law
    centers, mean, counts = radial_profile(x, y, z, vals, nbins=20, rmax=1.0)
    ok = counts > 50
    assert l1_error(mean[ok], 1.0 / centers[ok]) < 0.05
    assert l1_error(mean[ok], mean[ok]) == 0.0
