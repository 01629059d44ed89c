"""Integrator unit tests (reference analog: sph/test/positions.cpp —
time reversibility of the Press 2nd-order update)."""

import jax.numpy as jnp
import numpy as np

from sphexa_tpu.sfc.box import Box, Boundary
from sphexa_tpu.sph.positions import energy_update, position_update, temp_update


def _upd(dt, dt_m1, x, a, dx, box):
    z = jnp.zeros_like(x)
    xn, _, _, _, _, _, dxn, _, _ = position_update(
        dt, dt_m1, x, z, z, a, z, z, dx, z, z, box)
    return xn, dxn


def test_position_update_time_reversible():
    """positionUpdate(-dt, dt_m1, X_{n+1}, A, dX_{n+1}) recovers X_n
    (reference: positions.hpp:74-76 documents this property)."""
    box = Box.cube(-10.0, 10.0, Boundary.open)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, 64), jnp.float32)
    a = jnp.asarray(rng.uniform(-1, 1, 64), jnp.float32)
    dx = jnp.asarray(rng.uniform(-0.01, 0.01, 64), jnp.float32)
    dt, dt_m1 = 0.01, 0.008

    x1, dx1 = _upd(dt, dt_m1, x, a, dx, box)
    x0, _ = _upd(-dt, dt_m1, x1, a, dx, box)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x), atol=2e-6)


def test_position_update_constant_velocity():
    """Zero acceleration: x advances by (dx/dt_m1) * dt exactly."""
    box = Box.cube(-10.0, 10.0, Boundary.open)
    x = jnp.asarray([0.0], jnp.float32)
    dx = jnp.asarray([0.01], jnp.float32)
    a = jnp.zeros(1, jnp.float32)
    x1, dx1 = _upd(0.02, 0.01, x, a, dx, box)
    np.testing.assert_allclose(float(x1[0]), 0.02, rtol=1e-5)
    np.testing.assert_allclose(float(dx1[0]), 0.02, rtol=1e-5)


def test_position_update_periodic_wrap():
    box = Box.cube(-0.5, 0.5, Boundary.periodic)
    x = jnp.asarray([0.49], jnp.float32)
    dx = jnp.asarray([0.02], jnp.float32)
    a = jnp.zeros(1, jnp.float32)
    x1, _ = _upd(0.01, 0.01, x, a, dx, box)
    assert -0.5 <= float(x1[0]) < -0.47  # wrapped across the boundary


def test_energy_update_positivity_floor():
    """u must stay positive under strong cooling (reference:
    positions.hpp:57-60 exponential floor)."""
    u = energy_update(jnp.float32(1.0), 0.1, 0.1,
                      jnp.float32(-100.0), jnp.float32(0.0))
    assert float(u) > 0.0


def test_temp_update_matches_ab2():
    temp = jnp.asarray([2.0], jnp.float32)
    du = jnp.asarray([3.0], jnp.float32)
    du_m1 = jnp.asarray([1.0], jnp.float32)
    mui, gamma = 10.0, 5.0 / 3.0
    from sphexa_tpu.sph.eos import ideal_gas_cv
    cv = ideal_gas_cv(mui, gamma)
    dt = dt_m1 = 0.5
    got = float(temp_update(temp, dt, dt_m1, du, du_m1, mui, gamma)[0])
    u0 = cv * 2.0
    want = (u0 + 3.0 * dt + 0.5 * (3.0 - 1.0) / dt_m1 * dt * dt) / cv
    np.testing.assert_allclose(got, want, rtol=1e-6)
