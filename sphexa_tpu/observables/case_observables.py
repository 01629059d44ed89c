"""Case-specific observables (reference: main/src/observables/ —
turbulence Mach RMS, KH growth rate, wind-bubble survival)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sphexa_tpu.config import SphConfig
from sphexa_tpu.sph.eos import ideal_gas_cv
from sphexa_tpu.state import Particles


def turbulence_mach_rms(ps: Particles, cfg: SphConfig) -> float:
    """RMS Mach number (reference: observables/turbulence_mach_rms.hpp).
    c^2 = gamma (gamma-1) cv temp."""
    alive = ps.alive
    v2 = ps.vx ** 2 + ps.vy ** 2 + ps.vz ** 2
    cv = ideal_gas_cv(cfg.mui, cfg.gamma)
    c2 = cfg.gamma * (cfg.gamma - 1.0) * cv * ps.temp
    mach2 = jnp.where(alive, v2 / jnp.maximum(c2, 1e-30), 0.0)
    n = jnp.maximum(jnp.sum(alive), 1)
    return float(jnp.sqrt(jnp.sum(mach2) / n))


def kelvin_helmholtz_growth_rate(ps: Particles, cfg: SphConfig,
                                 ymin: float = 0.25, ymax: float = 0.75):
    """Mode-1 amplitude of the vy perturbation inside the dense band —
    the KH growth diagnostic (reference: observables/time_energy_growth.hpp
    computes an equivalent projection)."""
    alive = np.asarray(ps.alive)
    x = np.asarray(ps.x)[alive]
    y = np.asarray(ps.y)[alive]
    vy = np.asarray(ps.vy)[alive]
    band = (y > ymin) & (y < ymax)
    if band.sum() == 0:
        return 0.0
    si = np.sin(4 * np.pi * x[band])
    ci = np.cos(4 * np.pi * x[band])
    s = (vy[band] * si).mean()
    c = (vy[band] * ci).mean()
    return float(2.0 * np.sqrt(s * s + c * c))


def wind_bubble_survival(ps: Particles, cfg: SphConfig, rho,
                         rho_threshold: float = 6.4):
    """Fraction of initial cloud mass still above a density threshold
    (reference: observables/wind_bubble_fraction.hpp). Caller passes the
    current density field and identifies cloud particles by mask."""
    alive = np.asarray(ps.alive)
    dense = np.asarray(rho)[alive] > rho_threshold
    return float(dense.mean())
