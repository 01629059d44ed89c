"""Subsonic turbulence box (reference: main/src/init/turbulence_init.hpp).

Uniform isothermal-ish gas (gamma = 1.001) in a periodic unit box,
driven by the OU stirring module."""

from __future__ import annotations

import numpy as np

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.grid import regular_grid, initial_h
from sphexa_tpu.physics.turbulence import turbulence_constants
from sphexa_tpu.sfc.box import Box, Boundary
from sphexa_tpu.sph.eos import ideal_gas_cv
from sphexa_tpu.state import make_particles, make_state


def init_turbulence(side: int, cfg: SphConfig, capacity: int | None = None,
                    dt0: float | None = None):
    const = turbulence_constants()
    L = const["Lbox"]
    n = side ** 3
    x, y, z = regular_grid(L / 2, side)

    m_part = const["mTotal"] / n
    h0 = initial_h(cfg.ng0, L ** 3, n)
    cv = ideal_gas_cv(const["mui"], const["gamma"])
    temp0 = const["u0"] / cv
    dt_init = dt0 if dt0 is not None else const["minDt"]

    cfg = cfg.replace(gamma=const["gamma"], mui=const["mui"],
                      kcour=const["kcour"])
    ps = make_particles(capacity or n, n, x=x, y=y, z=z,
                        temp=np.full(n, temp0), h=np.full(n, h0),
                        m=np.full(n, m_part), alpha=np.full(n, cfg.alphamin))
    box = Box.cube(-L / 2, L / 2, Boundary.periodic)
    return make_state(ps, dt0=dt_init), box, cfg
