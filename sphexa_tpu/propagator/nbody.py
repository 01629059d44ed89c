"""Gravity-only (collisionless N-body) propagator
(reference: main/src/propagator/nbody.hpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.gravity.direct import direct_gravity, egrav as _egrav
from sphexa_tpu.propagator.common import StepDiagnostics
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.sph.positions import position_update
from sphexa_tpu.sph import timestep as ts
from sphexa_tpu.state import SimState
from sphexa_tpu.util.kahan import kahan_sum


def make_nbody_step(box: Box, cfg: SphConfig):
    @jax.jit
    def step(state: SimState):
        ps = state.p
        if cfg.gravity_solver == "fmm":
            from sphexa_tpu.gravity.fmm import FmmConfig, fmm_gravity
            g = fmm_gravity(ps.x, ps.y, ps.z, ps.m, ps.alive, box,
                            cfg.gravG, FmmConfig(level=cfg.fmm_level,
                                  min_sep=cfg.fmm_min_sep),
                            eps=cfg.eps)
        else:
            g = direct_gravity(ps.x, ps.y, ps.z, ps.m, ps.alive,
                               cfg.gravG, cfg.eps)
        eg = _egrav(ps.m, g.pot, ps.alive)

        dt = jnp.minimum(cfg.max_dt_increase * state.dt,
                         ts.acceleration_timestep(g.ax, g.ay, g.az, ps.alive,
                                                  cfg.eta_acc, cfg.eps))
        x, y, z, vx, vy, vz, dx, dy, dz = position_update(
            dt, state.dt, ps.x, ps.y, ps.z, g.ax, g.ay, g.az,
            ps.x_m1, ps.y_m1, ps.z_m1, box)
        ps = ps.replace(x=x, y=y, z=z, vx=vx, vy=vy, vz=vz,
                        x_m1=dx, y_m1=dy, z_m1=dz)

        ecin = 0.5 * kahan_sum(jnp.where(
            ps.alive, ps.m * (vx ** 2 + vy ** 2 + vz ** 2), 0.0))
        z32 = jnp.float32(0.0)
        diag = StepDiagnostics(
            dt=dt, ttot=state.ttot + dt, etot=ecin + eg, ecin=ecin,
            eint=z32, egrav=eg, h_max=z32, nc_mean=z32,
            max_nc=jnp.int32(0), max_cell_count=jnp.int32(0),
            maxvsignal=z32)
        return SimState(p=ps, ttot=state.ttot + dt, dt=dt, dt_m1=state.dt,
                        iteration=state.iteration + 1), diag

    return step
