"""Isobaric cube (reference: main/src/init/isobaric_cube_init.hpp).

A dense cube (rho=8) in pressure equilibrium with its surroundings
(rho=1, p=2.5) inside a periodic box — a surface-tension / contact
discontinuity noise test. We realize the density contrast by tiling a
finer lattice inside the cube; masses are uniform."""

from __future__ import annotations

import numpy as np

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.lattice import h_from_density
from sphexa_tpu.sfc.box import Box, Boundary
from sphexa_tpu.sph.eos import ideal_gas_cv
from sphexa_tpu.state import make_particles, make_state


def isobaric_cube_constants() -> dict:
    return dict(r=0.25, rDelta=0.25, dim=3, gamma=5.0 / 3.0, rhoExt=1.0,
                rhoInt=8.0, pIsobaric=2.5, minDt=1e-4, mui=10.0,
                gravConstant=0.0, ng0=100, ngmax=150)


def init_isobaric_cube(side: int, cfg: SphConfig, capacity: int | None = None,
                       dt0: float | None = None):
    const = isobaric_cube_constants()
    r = const["r"]                   # inner cube half-side
    L = 4 * r                        # box side (periodic, [-2r, 2r])
    rho_i, rho_e = const["rhoInt"], const["rhoExt"]

    # exterior lattice (exclude the inner cube), interior 2x finer (rho 8x)
    def lattice(ns, lo, hi):
        g = lo + (np.arange(ns) + 0.5) * (hi - lo) / ns
        Z, Y, X = np.meshgrid(g, g, g, indexing="ij")
        return X.ravel(), Y.ravel(), Z.ravel()

    xe, ye, ze = lattice(side, -2 * r, 2 * r)
    outside = np.maximum.reduce([np.abs(xe), np.abs(ye), np.abs(ze)]) > r
    xe, ye, ze = xe[outside], ye[outside], ze[outside]
    xi, yi, zi = lattice(side, -r, r)  # side^3 points in 1/64 the volume = 8x rho... adjust
    # interior density = rhoInt/rhoExt * exterior: exterior spacing d=L/side;
    # interior spacing must be d/2 -> side points across 2r = L/2 gives d/2. OK.
    x = np.concatenate([xe, xi])
    y = np.concatenate([ye, yi])
    z = np.concatenate([ze, zi])
    n = x.size

    # uniform particle mass from the exterior density
    d_ext = L / side
    m_part = rho_e * d_ext ** 3
    h_i = h_from_density(cfg.ng0, m_part, rho_i)
    h_e = h_from_density(cfg.ng0, m_part, rho_e)
    inner = np.maximum.reduce([np.abs(x), np.abs(y), np.abs(z)]) <= r
    h = np.where(inner, h_i, h_e)

    cv = ideal_gas_cv(const["mui"], const["gamma"])
    u = const["pIsobaric"] / (const["gamma"] - 1.0) / np.where(inner, rho_i, rho_e)
    temp = u / cv
    dt_init = dt0 if dt0 is not None else const["minDt"]

    cfg = cfg.replace(gamma=const["gamma"], mui=const["mui"])
    ps = make_particles(capacity or n, n, x=x, y=y, z=z, temp=temp, h=h,
                        m=np.full(n, m_part), alpha=np.full(n, cfg.alphamin))
    box = Box.cube(-2 * r, 2 * r, Boundary.periodic)
    return make_state(ps, dt0=dt_init), box, cfg
