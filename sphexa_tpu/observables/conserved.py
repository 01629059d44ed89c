"""Conserved-quantity observables, appended per step to constants.txt
(reference: main/src/observables/conserved_quantities.hpp:118,
observables/factory.hpp). All reductions use compensated summation and
mask padding rows; under sharding the caller psums the partials."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.sph.eos import ideal_gas_cv
from sphexa_tpu.state import Particles
from sphexa_tpu.util.kahan import kahan_sum


class Conserved(NamedTuple):
    etot: jnp.ndarray
    ecin: jnp.ndarray
    eint: jnp.ndarray
    egrav: jnp.ndarray
    linmom: jnp.ndarray   # |sum m v|
    angmom: jnp.ndarray   # |sum m r x v|


@jax.jit
def _conserved_impl(ps: Particles, mui, gamma, egrav):
    cv = ideal_gas_cv(mui, gamma)
    m = jnp.where(ps.alive, ps.m, 0.0)
    ecin = 0.5 * kahan_sum(m * (ps.vx ** 2 + ps.vy ** 2 + ps.vz ** 2))
    eint = kahan_sum(m * cv * ps.temp)

    px = kahan_sum(m * ps.vx)
    py = kahan_sum(m * ps.vy)
    pz = kahan_sum(m * ps.vz)
    lx = kahan_sum(m * (ps.y * ps.vz - ps.z * ps.vy))
    ly = kahan_sum(m * (ps.z * ps.vx - ps.x * ps.vz))
    lz = kahan_sum(m * (ps.x * ps.vy - ps.y * ps.vx))

    linmom = jnp.sqrt(px ** 2 + py ** 2 + pz ** 2)
    angmom = jnp.sqrt(lx ** 2 + ly ** 2 + lz ** 2)
    return Conserved(ecin + eint + egrav, ecin, eint, egrav, linmom, angmom)


def conserved_quantities(ps: Particles, cfg: SphConfig, egrav=0.0) -> Conserved:
    return _conserved_impl(ps, cfg.mui, cfg.gamma, jnp.float32(egrav))


def format_constants_line(iteration: int, ttot: float, dt: float,
                          q: Conserved) -> str:
    """One line of constants.txt (reference prints iteration, time, dt,
    energy budget and momenta per step)."""
    return ("%d %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g"
            % (iteration, ttot, dt, float(q.etot), float(q.ecin),
               float(q.eint), float(q.egrav), float(q.linmom),
               float(q.angmom)))
