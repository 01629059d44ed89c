"""Sedov-Taylor point-explosion analytic relations
(reference: main/src/analytical_solutions/sedov_solution/ — closed-form
generator used by the L1 acceptance tests).

Round-1 scope: shock trajectory and jump conditions (parameter-free
t^{2/5} scaling plus tabulated energy-integral constants); the full
self-similar interior profile generator is scheduled for the next round
(ROADMAP.md)."""

from __future__ import annotations

import numpy as np

# Energy-integral constant alpha for spherical (j=3), omega=0 explosions:
# E = alpha * rho0 * R^5 / t^2. Values from Sedov's classic tabulation.
_ALPHA = {
    round(5.0 / 3.0, 6): 0.4936,
    round(7.0 / 5.0, 6): 0.8511,
    round(1.4, 6): 0.8511,
}


def alpha_constant(gamma: float) -> float:
    key = round(gamma, 6)
    if key not in _ALPHA:
        raise ValueError(f"no tabulated Sedov alpha for gamma={gamma}")
    return _ALPHA[key]


def shock_radius(t, E: float, rho0: float, gamma: float):
    """R(t) = (E t^2 / (alpha rho0))^(1/5)."""
    return (E * np.asarray(t) ** 2 / (alpha_constant(gamma) * rho0)) ** 0.2


def shock_speed(t, E: float, rho0: float, gamma: float):
    return 0.4 * shock_radius(t, E, rho0, gamma) / np.asarray(t)


def jump_conditions(t, E: float, rho0: float, gamma: float, p0: float = 0.0):
    """Strong-shock Rankine-Hugoniot state right behind the front:
    returns (rho2, u2, p2)."""
    us = shock_speed(t, E, rho0, gamma)
    rho2 = rho0 * (gamma + 1.0) / (gamma - 1.0)
    u2 = 2.0 * us / (gamma + 1.0)
    p2 = 2.0 * rho0 * us ** 2 / (gamma + 1.0)
    return rho2, u2, p2
