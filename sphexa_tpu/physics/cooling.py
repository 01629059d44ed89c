"""Radiative cooling (GRACKLE-equivalent interface).

The reference wraps the GRACKLE C library behind a pimpl Cooler
(reference: physics/cooling/cooler.hpp:52-141 — cool_particles,
cooling_timestep, ~40 parameters). GRACKLE itself is an external
fetched dependency there; here the same interface is served by a
tabulated collisional-ionization-equilibrium cooling function
Lambda(T) (piecewise power-law CIE approximation) evaluated on device,
with subcycled exponential integration and a cooling-limited timestep.
The interface is designed so a real chemistry network can replace the
table without touching the propagator.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sphexa_tpu.config import SphConfig
from sphexa_tpu.sph.eos import ideal_gas_cv

# Piecewise power-law fit to a CIE cooling curve Lambda(T) [erg cm^3/s],
# log10 T breakpoints and slopes (solar-metallicity-like shape).
_LOGT = np.array([4.0, 4.25, 4.7, 5.5, 6.5, 7.5, 9.0])
_LOGL = np.array([-24.5, -21.9, -21.4, -21.2, -22.3, -22.6, -22.0])


@dataclasses.dataclass(frozen=True)
class CoolingParams:
    """Subset of the reference's GRACKLE parameter surface
    (cooler_impl.hpp)."""
    mu: float = 0.6                # mean molecular weight
    x_h: float = 0.76              # hydrogen mass fraction
    rho_to_cgs: float = 1.0        # code density -> g/cm^3 (unit system,
                                   # analog of GRACKLE's code_units)
    temp_to_k: float = 1.0         # code temperature -> Kelvin
    t_floor: float = 1e2           # temperature floor [K]
    subcycles: int = 4             # cooling subcycles per hydro step
    dt_fraction: float = 0.1       # cooling-limited dt = frac * u/|du_cool|


def lambda_cie(temp_k):
    """Interpolated log-log cooling function; zero below 10^4 K."""
    logt = jnp.log10(jnp.maximum(temp_k, 1.0))
    logl = jnp.interp(logt, jnp.asarray(_LOGT), jnp.asarray(_LOGL))
    return jnp.where(temp_k > 1e4, 10.0 ** logl, 0.0)


def cooling_rate_du(temp_k, rho_cgs, params: CoolingParams):
    """du/dt [erg/g/s] = - n_H^2 Lambda(T) / rho."""
    mh = 1.6726e-24
    n_h = params.x_h * rho_cgs / mh
    return -n_h * n_h * lambda_cie(temp_k) / jnp.maximum(rho_cgs, 1e-60)


def cool_particles(temp, rho, dt, cfg: SphConfig,
                   params: CoolingParams = CoolingParams()):
    """Subcycled cooling update of the temperature field
    (reference: cooler.hpp cool_particles). Unit conversion happens via
    params.rho_to_cgs / temp_to_k (the GRACKLE code_units analog)."""
    cv = ideal_gas_cv(params.mu, cfg.gamma)
    sub_dt = dt / params.subcycles
    rho_cgs = rho * params.rho_to_cgs

    def body(_, t):
        u = cv * t
        du = cooling_rate_du(t * params.temp_to_k, rho_cgs, params) / params.temp_to_k
        # exponential-decay floor keeps u positive (same guard as the
        # energy integrator, positions.hpp:54-61)
        u_new = u + du * sub_dt
        safe_u = jnp.maximum(u, 1e-30)
        u_new = jnp.where(u_new <= 0.0, safe_u * jnp.exp(u_new * sub_dt / safe_u),
                          u_new)
        return jnp.maximum(u_new / cv, params.t_floor / params.temp_to_k)

    return jax.lax.fori_loop(0, params.subcycles, body, temp)


def cooling_timestep(temp, rho, cfg: SphConfig,
                     params: CoolingParams = CoolingParams()):
    """dt limit = frac * u / |du_cool| (reference: cooling_timestep)."""
    cv = ideal_gas_cv(params.mu, cfg.gamma)
    u = cv * temp
    du = jnp.abs(cooling_rate_du(temp * params.temp_to_k,
                                 rho * params.rho_to_cgs, params)
                 / params.temp_to_k)
    dt_i = params.dt_fraction * u / jnp.maximum(du, 1e-60)
    return jnp.min(dt_i)
