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


def test_params_from_settings_roundtrip():
    """The reference persists every GRACKLE parameter as a
    `cooling::<name>` attribute (cooler.hpp:130, cooler_impl.hpp:63-83);
    applied names map to model fields, GRACKLE-internal ones round-trip
    verbatim, typos are rejected."""
    s = {"cooling::Gamma": 1.4, "cooling::HydrogenFractionByMass": 0.7,
         "cooling::metal_cooling": 0, "cooling::metallicity": 0.3,
         "cooling::cmb_temperature_floor": 1,
         "cooling::max_iterations": 16,
         # GRACKLE-internal: carried, not applied
         "cooling::UVbackground": 1,
         "cooling::DeuteriumToHydrogenRatio": 6.8e-5,
         "other::unrelated": 5}
    p = CoolingParams.from_settings(s)
    assert p.gamma == 1.4 and p.x_h == 0.7
    assert p.metal_cooling is False and p.metallicity == 0.3
    assert p.cmb_temperature_floor is True
    assert p.max_iterations == 16
    assert dict(p.extra)["UVbackground"] == 1.0
    out = p.to_settings()
    assert out["cooling::Gamma"] == 1.4
    assert out["cooling::UVbackground"] == 1.0
    assert out["cooling::metal_cooling"] == 0
    # typo guard
    import pytest
    with pytest.raises(ValueError):
        CoolingParams.from_settings({"cooling::metal_coling": 1})


def test_metal_cooling_scales_curve():
    t = jnp.asarray([3e5], jnp.float32)
    lam_z0 = float(lambda_cie(t, CoolingParams(metal_cooling=False))[0])
    lam_z1 = float(lambda_cie(t, CoolingParams(metallicity=1.0))[0])
    lam_z2 = float(lambda_cie(t, CoolingParams(metallicity=2.0))[0])
    assert lam_z1 > 2 * lam_z0          # metals dominate at 3e5 K
    assert lam_z2 > 1.5 * lam_z1


def test_heating_terms():
    p_heat = CoolingParams(photoelectric_heating=True,
                           with_radiative_cooling=False)
    t = jnp.asarray([1e4], jnp.float32)
    rho = jnp.asarray([1e-24], jnp.float32)
    du = float(cooling_rate_du(t, rho, p_heat)[0])
    assert du > 0                        # pure heating
    p_cool = CoolingParams()
    du2 = float(cooling_rate_du(jnp.asarray([1e6], jnp.float32), rho,
                                p_cool)[0])
    assert du2 < 0                       # radiative cooling wins
    # master gate: no radiative cooling, no heating switches -> 0
    p_off = CoolingParams(with_radiative_cooling=False)
    assert float(cooling_rate_du(t, rho, p_off)[0]) == 0.0
