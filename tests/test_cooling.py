"""Cooling module (reference analog: physics/cooling tests)."""

import numpy as np
import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.physics.cooling import (CoolingParams, cool_particles,
                                        cooling_rate_du, cooling_timestep,
                                        lambda_cie)


def test_lambda_shape():
    t = jnp.asarray([1e3, 1e4, 2e4, 1e5, 1e7], jnp.float32)
    lam = np.asarray(lambda_cie(t))
    assert lam[0] == 0.0                 # below the cooling floor
    assert lam[1] == 0.0                 # at exactly 1e4: boundary
    assert lam[2] > 0.0
    # peak near 1e5 K exceeds the bremsstrahlung regime at 1e7 K
    assert lam[3] > lam[4] > 0.0


def test_cooling_monotonic_and_positive():
    cfg = SphConfig()
    temp = jnp.full((64,), 1e6, jnp.float32)
    rho = jnp.full((64,), 1e-24, jnp.float32)  # ~ISM density, CGS
    out = cool_particles(temp, rho, dt=1e10, cfg=cfg)
    out = np.asarray(out)
    assert (out < 1e6).all()             # gas cooled
    assert (out >= CoolingParams().t_floor).all()


def test_cooling_timestep_positive():
    cfg = SphConfig()
    temp = jnp.full((8,), 1e6, jnp.float32)
    rho = jnp.full((8,), 1e-24, jnp.float32)
    dt = float(cooling_timestep(temp, rho, cfg))
    assert dt > 0
    # hotter+denser cools faster -> smaller dt limit
    dt2 = float(cooling_timestep(temp, rho * 10, cfg))
    assert dt2 < dt


def test_std_cooling_propagator_smoke():
    from sphexa_tpu.init.sedov import init_sedov
    from sphexa_tpu.neighbors import CellGrid, choose_level
    from sphexa_tpu.propagator.std_cooling import make_std_cooling_step

    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(10, cfg, dt0=1e-4)
    grid = CellGrid(choose_level(box, float(state.p.h[0]) * 1.3))
    # unit system: code rho ~ 1 maps to diffuse ISM; code temp in K
    params = CoolingParams(rho_to_cgs=1e-24, temp_to_k=1.0)
    step = make_std_cooling_step(box, grid, cfg, params)
    for _ in range(3):
        state, diag = step(state)
    assert np.isfinite(float(diag.etot))
    assert float(diag.dt) > 0
