"""Round-2 physics completeness batch: gravitational-wave observable,
CIE chemistry fields, evrard-cooling case, turbulence checkpoint
round-trip (reference: observables/gravitational_waves.hpp,
physics/cooling/chemistry_data.hpp, init evrard-cooling,
hydro_turb/turbulence_data.hpp:56)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sphexa_tpu.config import SphConfig


def test_d2_quadrupole_orbit_analytic():
    """Two-body circular orbit: d2Q/dt2 from (x,v,a) must match the
    analytic second derivative of the traceless quadrupole."""
    from sphexa_tpu.observables.grav_waves import (compute_htt,
                                                   d2_quadrupole)

    m, R, w = 2.0, 1.5, 0.7
    x = jnp.asarray([R, -R]); y = jnp.asarray([0.0, 0.0])
    z = jnp.zeros(2)
    vx = jnp.zeros(2); vy = jnp.asarray([R * w, -R * w]); vz = jnp.zeros(2)
    ax = jnp.asarray([-R * w * w, R * w * w]); ay = jnp.zeros(2)
    az = jnp.zeros(2)
    mm = jnp.full(2, m)
    alive = jnp.ones(2, bool)
    d2q = np.asarray(d2_quadrupole(x, y, z, vx, vy, vz, ax, ay, az, mm,
                                   alive))
    # analytic traceless quadrupole (tr Q = 2 m R^2 is constant):
    # Ibar_xx = 2 m R^2 cos^2 - tr/3 -> d2Ibar_xx(0) = -4 m R^2 w^2,
    # d2Ibar_yy(0) = +4 m R^2 w^2, d2Ibar_zz = 0
    want_xx = -4.0 * m * R * R * w * w
    np.testing.assert_allclose(d2q[0], want_xx, rtol=1e-6)
    np.testing.assert_allclose(d2q[1], -want_xx, rtol=1e-5)
    np.testing.assert_allclose(d2q[2], 0.0, atol=1e-5 * abs(want_xx))
    np.testing.assert_allclose(d2q[3:], 0.0, atol=1e-6 * abs(want_xx))

    hp, hx = compute_htt(d2q, theta=0.0, phi=0.0)
    # face-on: h+ ~ (d2Qxx - d2Qyy) * units, hx ~ 2 d2Qxy * units
    # (fp64 on the expected side: GW_UNITS ~ 3e-72 underflows float32)
    from sphexa_tpu.observables.grav_waves import GW_UNITS
    d64 = d2q.astype(np.float64)
    np.testing.assert_allclose(hp, (d64[0] - d64[1]) * GW_UNITS, rtol=1e-6)
    np.testing.assert_allclose(hx, 2 * d64[3] * GW_UNITS, atol=1e-75)


def test_d2_quadrupole_finite_difference():
    """Cross-check the analytic (x,v,a) form against a centered finite
    difference of Q(t) on the orbit."""
    from sphexa_tpu.observables.grav_waves import d2_quadrupole

    m, R, w = 1.0, 1.0, 1.0

    def q(t):
        # traceless 2/3-convention diagonal as in the reference
        xs = np.array([R * np.cos(w * t), -R * np.cos(w * t)])
        ys = np.array([R * np.sin(w * t), -R * np.sin(w * t)])
        qxx = (m * xs ** 2).sum()
        qyy = (m * ys ** 2).sum()
        tr = qxx + qyy
        return np.array([qxx - tr / 3.0, (m * xs * ys).sum()])

    eps = 1e-4
    d2_fd = (q(eps) - 2 * q(0) + q(-eps)) / eps ** 2

    t = 0.0
    x = jnp.asarray([R, -R]); y = jnp.zeros(2); z = jnp.zeros(2)
    vx = jnp.zeros(2); vy = jnp.asarray([R * w, -R * w]); vz = jnp.zeros(2)
    ax = jnp.asarray([-R * w * w, R * w * w]); ay = jnp.zeros(2)
    az = jnp.zeros(2)
    d2q = np.asarray(d2_quadrupole(x, y, z, vx, vy, vz, ax, ay, az,
                                   jnp.full(2, m), jnp.ones(2, bool)))
    np.testing.assert_allclose(d2q[0], d2_fd[0], rtol=1e-3)
    np.testing.assert_allclose(d2q[3], d2_fd[1], atol=1e-3)


def test_chemistry_cie_limits():
    from sphexa_tpu.physics.chemistry import cie_equilibrium

    cold = cie_equilibrium(jnp.asarray([8.0e3]))
    hot = cie_equilibrium(jnp.asarray([3.0e5]))
    assert float(cold.x_HII[0]) < 0.05
    assert float(hot.x_HII[0]) > 0.99
    assert float(hot.x_HeIII[0]) > 0.5
    for c in (cold, hot):
        np.testing.assert_allclose(float(c.x_HI[0] + c.x_HII[0]), 1.0,
                                   rtol=1e-6)
        np.testing.assert_allclose(
            float(c.x_HeI[0] + c.x_HeII[0] + c.x_HeIII[0]), 1.0, rtol=1e-6)
    # electrons increase with ionization
    assert float(hot.x_e[0]) > float(cold.x_e[0])


@pytest.mark.slow
def test_evrard_cooling_e2e():
    from sphexa_tpu.init.evrard_cooling import init_evrard_cooling
    from sphexa_tpu.neighbors import CellGrid, choose_level
    from sphexa_tpu.propagator.std_cooling import make_std_cooling_step

    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg, ex = init_evrard_cooling(8, cfg, dt0=1e-4)
    chem, cparams = ex["chem"], ex["cooling_params"]
    grid = CellGrid(choose_level(
        box, float(np.asarray(state.p.h)[np.asarray(state.p.alive)].max())
        * 1.3))
    step = make_std_cooling_step(box, grid, cfg, params=cparams,
                                 with_chemistry=True)
    for _ in range(2):
        state, diag, chem = step(state, chem)
    assert np.isfinite(float(diag.etot))
    assert float(diag.egrav) < 0.0  # bound sphere
    xh2 = np.asarray(chem.x_HII)
    alive = np.asarray(state.p.alive)
    assert ((xh2[alive] >= 0) & (xh2[alive] <= 1)).all()


def test_turbulence_checkpoint_roundtrip(tmp_path):
    from sphexa_tpu.io.hdf5 import load_turbulence_state, save_checkpoint
    from sphexa_tpu.init.sedov import init_sedov
    from sphexa_tpu.physics.turbulence import TurbulenceData

    td = TurbulenceData.create()
    for _ in range(3):
        td.update_noise(1e-3)
    ck = td.checkpoint_state()

    cfg = SphConfig()
    state, box, cfg = init_sedov(6, cfg, dt0=1e-4)
    path = str(tmp_path / "turb.h5")
    save_checkpoint(path, state, cfg, box, turb_state=ck)
    ck2 = load_turbulence_state(path)
    assert ck2 is not None
    np.testing.assert_array_equal(ck2["phases"], ck["phases"])

    td2 = TurbulenceData.create()
    td2.restore(ck2)
    td.update_noise(1e-3)
    td2.update_noise(1e-3)
    np.testing.assert_allclose(td2.phases, td.phases, rtol=1e-12)
    pr1, pi1 = td.projected_phases()
    pr2, pi2 = td2.projected_phases()
    np.testing.assert_allclose(pr2, pr1, rtol=1e-12)
