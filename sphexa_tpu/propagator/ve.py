"""VE (modern SPH) propagator: the per-step driver.

Orchestrates the same force pipeline as the reference HydroVeProp
(reference: main/src/propagator/ve_hydro.hpp:132-218):

  sort -> neighbors(+h) -> xmass -> gradh -> EOS -> IAD+divv/curlv ->
  AV switches -> momentum+energy -> dt -> positions -> h update

but as one jitted pure function over the SimState pytree. There are no
halo exchanges on a single chip; the multi-chip version interleaves
ppermute halo refreshes between stages exactly where the reference
places its MPI exchanges (domain/slab.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.neighbors import CellGrid, build_cell_list, build_neighbor_list
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.sph import hydro_ve
from sphexa_tpu.sph.eos import eos_ve, ideal_gas_cv
from sphexa_tpu.sph.kernels import update_h
from sphexa_tpu.sph.positions import position_update, temp_update
from sphexa_tpu.sph import timestep as ts
from sphexa_tpu.state import Particles, SimState
from sphexa_tpu.util.kahan import kahan_sum


class StepDiagnostics(NamedTuple):
    dt: jnp.ndarray
    ttot: jnp.ndarray
    etot: jnp.ndarray
    ecin: jnp.ndarray
    eint: jnp.ndarray
    h_max: jnp.ndarray
    nc_mean: jnp.ndarray
    max_nc: jnp.ndarray
    max_cell_count: jnp.ndarray
    maxvsignal: jnp.ndarray


def compute_energies(ps: Particles, cfg: SphConfig):
    """Kinetic + internal energy with compensated reductions
    (reference: main/src/observables/conserved_quantities.hpp:118)."""
    cv = ideal_gas_cv(cfg.mui, cfg.gamma)
    m = jnp.where(ps.alive, ps.m, 0.0)
    ecin = 0.5 * kahan_sum(m * (ps.vx ** 2 + ps.vy ** 2 + ps.vz ** 2))
    eint = kahan_sum(m * cv * ps.temp)
    return ecin, eint


def compute_forces_ve(ps: Particles, box: Box, grid: CellGrid,
                      cfg: SphConfig, dt):
    """Domain sort + neighbor build + the five VE pair stages.

    Returns (sorted particles with updated h/alpha, force arrays, aux).
    """
    cl = build_cell_list(grid, box, ps.x, ps.y, ps.z, alive=ps.alive)
    ps = ps.permute(cl.perm)
    nl = build_neighbor_list(grid, box, cl, ps.x, ps.y, ps.z, ps.h, cfg,
                             adapt_h=True, alive=ps.alive)
    ps = ps.replace(h=nl.h)
    x, y, z, h = ps.x, ps.y, ps.z, ps.h
    idx, nc = nl.idx, nl.nc

    xm = hydro_ve.compute_xmass(box, x, y, z, h, ps.m, idx, nc, cfg)
    kx, gradh = hydro_ve.compute_ve_def_gradh(box, x, y, z, h, ps.m, xm,
                                              idx, nc, cfg)
    rho, p, c, prho = eos_ve(ps.temp, ps.m, kx, xm, gradh, cfg.mui, cfg.gamma)

    iad = hydro_ve.compute_iad_divv_curlv(box, x, y, z, ps.vx, ps.vy, ps.vz,
                                          h, kx, xm, idx, nc, cfg)
    cij = (iad.c11, iad.c12, iad.c13, iad.c22, iad.c23, iad.c33)

    alpha = hydro_ve.compute_av_switches(box, x, y, z, ps.vx, ps.vy, ps.vz,
                                         h, c, kx, xm, iad.divv, cij,
                                         ps.alpha, dt, idx, nc, cfg)
    ps = ps.replace(alpha=alpha)

    gradv = ((iad.dV11, iad.dV12, iad.dV13, iad.dV22, iad.dV23, iad.dV33)
             if cfg.av_clean else None)
    me = hydro_ve.compute_momentum_energy(box, x, y, z, ps.vx, ps.vy, ps.vz,
                                          h, ps.m, prho, c, cij, kx, xm,
                                          alpha, idx, nc, cfg, gradv=gradv)

    aux = dict(c=c, divv=iad.divv, rho=rho, p=p, nc_sph=nl.nc_sph,
               max_nc=nl.max_nc, max_cell_count=nl.max_cell_count)
    return ps, me, aux


def make_ve_step(box: Box, grid: CellGrid, cfg: SphConfig):
    """Build the jitted full step: forces + timestep + integration."""

    @jax.jit
    def step(state: SimState):
        ps, me, aux = compute_forces_ve(state.p, box, grid, cfg, state.dt)

        # --- global timestep (reference: ts_global.hpp:96-112) ---
        dt_courant = ts.courant_timestep(me.maxvsignal, ps.h, aux["c"],
                                         ps.alive, cfg.kcour)
        dt_rho = ts.rho_timestep(aux["divv"], ps.alive, cfg.krho)
        candidates = [dt_courant, dt_rho]
        if cfg.gravG != 0.0:
            candidates.append(ts.acceleration_timestep(
                me.ax, me.ay, me.az, ps.alive, cfg.eta_acc, cfg.eps))
        dt = ts.combine_timesteps(state.dt, jnp.stack(candidates), cfg)
        dt_m1 = state.dt

        # --- integration (reference: positions.hpp) ---
        x, y, z, vx, vy, vz, dx, dy, dz = position_update(
            dt, dt_m1, ps.x, ps.y, ps.z, me.ax, me.ay, me.az,
            ps.x_m1, ps.y_m1, ps.z_m1, box,
            h=ps.h, vx=ps.vx, vy=ps.vy, vz=ps.vz)
        temp = temp_update(ps.temp, dt, dt_m1, me.du, ps.du_m1,
                           cfg.mui, cfg.gamma)
        h = update_h(cfg.ng0, aux["nc_sph"], ps.h)

        ps = ps.replace(x=x, y=y, z=z, vx=vx, vy=vy, vz=vz,
                        x_m1=dx, y_m1=dy, z_m1=dz, temp=temp, h=h,
                        du_m1=me.du)

        ecin, eint = compute_energies(ps, cfg)
        diag = StepDiagnostics(
            dt=dt, ttot=state.ttot + dt, etot=ecin + eint, ecin=ecin,
            eint=eint, h_max=jnp.max(jnp.where(ps.alive, ps.h, 0.0)),
            nc_mean=(jnp.sum(jnp.where(ps.alive, aux["nc_sph"], 0))
                     / jnp.maximum(jnp.sum(ps.alive), 1)).astype(jnp.float32),
            max_nc=aux["max_nc"], max_cell_count=aux["max_cell_count"],
            maxvsignal=jnp.max(jnp.where(ps.alive, me.maxvsignal, 0.0)))

        new_state = SimState(p=ps, ttot=state.ttot + dt, dt=dt, dt_m1=dt_m1,
                             iteration=state.iteration + 1)
        return new_state, diag

    return step
