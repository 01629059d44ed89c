"""Per-particle chemistry fields: collisional-ionization-equilibrium
H/He network (the ChemistryData analog, reference:
physics/cooling/chemistry_data.hpp:116 — GRACKLE's 13-species arrays).

The reference delegates the network to GRACKLE (cooler_impl.hpp:392).
GRACKLE cannot run on TPU; the stand-in solves the H/He ionization
balance in CIE with the Cen (1992, ApJS 78, 341) collisional-ionization
and radiative-recombination rate fits — the same physics class GRACKLE
reduces to with primordial chemistry, UV background off, at equilibrium.
All updates are closed-form and elementwise (VPU-trivial).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

# H/He mass fractions (GRACKLE defaults)
HYDROGEN_FRACTION = 0.76
HELIUM_FRACTION = 1.0 - HYDROGEN_FRACTION


@struct.dataclass
class ChemistryData:
    """Species fractions per particle (of the respective element's
    nuclei; x_e is electrons per H nucleus)."""
    x_HI: jnp.ndarray
    x_HII: jnp.ndarray
    x_HeI: jnp.ndarray
    x_HeII: jnp.ndarray
    x_HeIII: jnp.ndarray
    x_e: jnp.ndarray

    @classmethod
    def create(cls, n: int, ionized: bool = False):
        one = jnp.ones((n,), jnp.float32)
        zero = jnp.zeros((n,), jnp.float32)
        if ionized:
            return cls(x_HI=zero, x_HII=one, x_HeI=zero, x_HeII=zero,
                       x_HeIII=one, x_e=one * (1.0 + 2.0 * _Y_OVER_X))
        return cls(x_HI=one, x_HII=zero, x_HeI=one, x_HeII=zero,
                   x_HeIII=zero, x_e=zero)


_Y_OVER_X = (HELIUM_FRACTION / 4.0) / HYDROGEN_FRACTION  # He:H nuclei ratio


def _safe_exp(x):
    return jnp.exp(jnp.clip(x, -80.0, 0.0))


def cie_equilibrium(temp_k) -> ChemistryData:
    """CIE ionization fractions at temperature T [K] (Cen 1992 fits).

    Equilibrium per stage: x_up / x_down = Gamma_coll(T) / alpha_rec(T),
    electron-density independent (n_e cancels in two-body balance)."""
    T = jnp.maximum(temp_k, 10.0)
    sqT = jnp.sqrt(T)
    T5 = jnp.sqrt(T / 1e5)

    # collisional ionization rates [cm^3/s]
    g_HI = 5.85e-11 * sqT * _safe_exp(-157809.1 / T) / (1.0 + T5)
    g_HeI = 2.38e-11 * sqT * _safe_exp(-285335.4 / T) / (1.0 + T5)
    g_HeII = 5.68e-12 * sqT * _safe_exp(-631515.0 / T) / (1.0 + T5)

    # recombination rates [cm^3/s] (radiative; case A-ish fits)
    a_HII = (8.4e-11 / sqT) * jnp.power(T / 1e3, -0.2) \
        / (1.0 + jnp.power(T / 1e6, 0.7))
    a_HeII = 1.5e-10 * jnp.power(T, -0.6353)
    a_HeIII = (3.36e-10 / sqT) * jnp.power(T / 1e3, -0.2) \
        / (1.0 + jnp.power(T / 1e6, 0.7))

    r_H = g_HI / jnp.maximum(a_HII, 1e-30)        # x_HII / x_HI
    x_HII = r_H / (1.0 + r_H)
    x_HI = 1.0 - x_HII

    r1 = g_HeI / jnp.maximum(a_HeII, 1e-30)       # x_HeII / x_HeI
    r2 = g_HeII / jnp.maximum(a_HeIII, 1e-30)     # x_HeIII / x_HeII
    denom = 1.0 + r1 + r1 * r2
    x_HeI = 1.0 / denom
    x_HeII = r1 / denom
    x_HeIII = r1 * r2 / denom

    x_e = x_HII + _Y_OVER_X * (x_HeII + 2.0 * x_HeIII)
    return ChemistryData(x_HI=x_HI, x_HII=x_HII, x_HeI=x_HeI,
                         x_HeII=x_HeII, x_HeIII=x_HeIII, x_e=x_e)


def update_chemistry(chem: ChemistryData, temp, alive) -> ChemistryData:
    """Relax fractions to the CIE equilibrium at the current temperature
    (instantaneous equilibrium — CIE assumption, matching the cooling
    table in physics/cooling.py)."""
    eq = cie_equilibrium(temp)
    pick = lambda new, old: jnp.where(alive, new, old)
    return ChemistryData(
        x_HI=pick(eq.x_HI, chem.x_HI), x_HII=pick(eq.x_HII, chem.x_HII),
        x_HeI=pick(eq.x_HeI, chem.x_HeI),
        x_HeII=pick(eq.x_HeII, chem.x_HeII),
        x_HeIII=pick(eq.x_HeIII, chem.x_HeIII),
        x_e=pick(eq.x_e, chem.x_e))


def mean_molecular_weight(chem: ChemistryData):
    """mu from the ionization state (for a chemistry-consistent EOS)."""
    X, Y = HYDROGEN_FRACTION, HELIUM_FRACTION
    inv_mu = X * (1.0 + chem.x_e) + Y / 4.0
    return 1.0 / inv_mu
