"""Shared step tail: global timestep + integration + diagnostics,
used by the XLA, Pallas, and sharded VE propagators."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.sph import timestep as ts
from sphexa_tpu.sph.eos import ideal_gas_cv
from sphexa_tpu.sph.kernels import update_h
from sphexa_tpu.sph.positions import position_update, temp_update
from sphexa_tpu.state import Particles, SimState
from sphexa_tpu.util.kahan import kahan_sum


class StepDiagnostics(NamedTuple):
    dt: jnp.ndarray
    ttot: jnp.ndarray
    etot: jnp.ndarray
    ecin: jnp.ndarray
    eint: jnp.ndarray
    egrav: jnp.ndarray
    h_max: jnp.ndarray
    nc_mean: jnp.ndarray
    max_nc: jnp.ndarray
    max_cell_count: jnp.ndarray
    maxvsignal: jnp.ndarray
    bounds: jnp.ndarray = None   # [xmin,xmax,ymin,ymax,zmin,zmax] of alive
                                 # particles (drives host box expansion on
                                 # open boundaries — the static-shape analog
                                 # of the reference's per-sync makeGlobalBox,
                                 # box_mpi.hpp:84)
    nf_truncated: jnp.ndarray = 0   # FMM near-field slots beyond leaf_cap
                                    # (silently dropped pairs — fail-stop,
                                    # see gravity/fmm.FmmGravity)
    rho: jnp.ndarray = None      # per-particle density/pressure of the
    p: jnp.ndarray = None        # force step (output columns for the
                                 # reference's compare_*.py tooling)


def compute_energies(ps: Particles, cfg: SphConfig):
    """Kinetic + internal energy with compensated reductions
    (reference: main/src/observables/conserved_quantities.hpp:118)."""
    cv = ideal_gas_cv(cfg.mui, cfg.gamma)
    ecin = 0.5 * kahan_sum(jnp.where(
        ps.alive, ps.m * (ps.vx ** 2 + ps.vy ** 2 + ps.vz ** 2), 0.0))
    eint = kahan_sum(jnp.where(ps.alive, ps.m * cv * ps.temp, 0.0))
    return ecin, eint


def finish_step(state: SimState, ps: Particles, ax, ay, az, du, maxvsignal,
                c, divv, nc_sph, box: Box, cfg: SphConfig,
                max_nc, max_cell_count, egrav=0.0, nf_truncated=0,
                rho=None, p=None):
    """Timestep + Press-2 integration + AB2 energy + h controller + diag.
    `ps` must carry the force-step-updated h/alpha."""
    dt_courant = ts.courant_timestep(maxvsignal, ps.h, c, ps.alive, cfg.kcour)
    candidates = [dt_courant]
    if divv is not None:  # std pipeline has no divv (reference: std_hydro)
        candidates.append(ts.rho_timestep(divv, ps.alive, cfg.krho))
    if cfg.gravG != 0.0:
        candidates.append(ts.acceleration_timestep(
            ax, ay, az, ps.alive, cfg.eta_acc, cfg.eps))
    dt = ts.combine_timesteps(state.dt, jnp.stack(candidates), cfg)
    dt_m1 = state.dt

    x, y, z, vx, vy, vz, dx, dy, dz = position_update(
        dt, dt_m1, ps.x, ps.y, ps.z, ax, ay, az,
        ps.x_m1, ps.y_m1, ps.z_m1, box,
        h=ps.h, vx=ps.vx, vy=ps.vy, vz=ps.vz)
    temp = temp_update(ps.temp, dt, dt_m1, du, ps.du_m1, cfg.mui, cfg.gamma)
    h = update_h(cfg.ng0, nc_sph, ps.h, h_cap=cfg.h_cap)

    ps = ps.replace(x=x, y=y, z=z, vx=vx, vy=vy, vz=vz,
                    x_m1=dx, y_m1=dy, z_m1=dz, temp=temp, h=h, du_m1=du)

    ecin, eint = compute_energies(ps, cfg)
    egrav = jnp.float32(egrav)
    big = jnp.float32(1e30)
    bounds = jnp.stack([
        jnp.min(jnp.where(ps.alive, ps.x, big)),
        jnp.max(jnp.where(ps.alive, ps.x, -big)),
        jnp.min(jnp.where(ps.alive, ps.y, big)),
        jnp.max(jnp.where(ps.alive, ps.y, -big)),
        jnp.min(jnp.where(ps.alive, ps.z, big)),
        jnp.max(jnp.where(ps.alive, ps.z, -big))])
    diag = StepDiagnostics(
        bounds=bounds,
        dt=dt, ttot=state.ttot + dt, etot=ecin + eint + egrav, ecin=ecin,
        eint=eint, egrav=egrav, h_max=jnp.max(jnp.where(ps.alive, ps.h, 0.0)),
        nc_mean=(jnp.sum(jnp.where(ps.alive, nc_sph, 0))
                 / jnp.maximum(jnp.sum(ps.alive), 1)).astype(jnp.float32),
        max_nc=max_nc, max_cell_count=max_cell_count,
        nf_truncated=jnp.int32(nf_truncated),
        rho=rho, p=p,
        maxvsignal=jnp.max(jnp.where(ps.alive, maxvsignal, 0.0)))

    new_state = SimState(p=ps, ttot=state.ttot + dt, dt=dt, dt_m1=dt_m1,
                         iteration=state.iteration + 1)
    return new_state, diag
