"""VE (modern SPH) propagator: the per-step driver (XLA gather path).

Orchestrates the same force pipeline as the reference HydroVeProp
(reference: main/src/propagator/ve_hydro.hpp:132-218):

  sort -> neighbors(+h) -> xmass -> gradh -> EOS -> IAD+divv/curlv ->
  AV switches -> momentum+energy -> dt -> positions -> h update

as one jitted pure function over the SimState pytree. There are no halo
exchanges on a single chip; the multi-chip version (ve_sharded.py)
interleaves ppermute halo refreshes where the reference places its MPI
exchanges. The Pallas cell-major fast path lives in ve_pallas.py.
"""

from __future__ import annotations

import jax

from sphexa_tpu.config import SphConfig
from sphexa_tpu.neighbors import CellGrid, build_cell_list, build_neighbor_list
from sphexa_tpu.propagator.common import (StepDiagnostics, compute_energies,
                                          finish_step)
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.sph import hydro_ve
from sphexa_tpu.sph.eos import eos_ve
from sphexa_tpu.state import Particles, SimState

__all__ = ["make_ve_step", "compute_forces_ve", "compute_energies",
           "StepDiagnostics"]


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

    aux = dict(c=c, divv=iad.divv, curlv=iad.curlv, rho=rho, p=p,
               nc_sph=nl.nc_sph, max_nc=nl.max_nc,
               max_cell_count=nl.max_cell_count)
    return ps, me, aux


def make_ve_step(box: Box, grid: CellGrid, cfg: SphConfig):
    """Build the jitted full step: forces + timestep + integration."""

    @jax.jit
    def step(state: SimState):
        ps, me, aux = compute_forces_ve(state.p, box, grid, cfg, state.dt)
        ax, ay, az = me.ax, me.ay, me.az
        egrav = 0.0
        nf_trunc = 0
        if cfg.gravG != 0.0:
            # self-gravity (reference: ve_hydro.hpp:195-204 upsweep+traverse)
            from sphexa_tpu.gravity.direct import egrav as _eg
            if cfg.gravity_solver == "fmm":
                from sphexa_tpu.gravity.fmm import FmmConfig, fmm_gravity
                g = fmm_gravity(ps.x, ps.y, ps.z, ps.m, ps.alive, box,
                                cfg.gravG, FmmConfig(level=cfg.fmm_level,
                                  min_sep=cfg.fmm_min_sep),
                                eps=cfg.eps)
            else:
                from sphexa_tpu.gravity.direct import direct_gravity
                g = direct_gravity(ps.x, ps.y, ps.z, ps.m, ps.alive,
                                   cfg.gravG, cfg.eps)
            ax = ax + g.ax
            ay = ay + g.ay
            az = az + g.az
            egrav = _eg(ps.m, g.pot, ps.alive)
            nf_trunc = getattr(g, "nf_truncated", 0)
        return finish_step(state, ps, ax, ay, az, me.du,
                           me.maxvsignal, aux["c"], aux["divv"],
                           aux["nc_sph"], box, cfg,
                           max_nc=aux["max_nc"],
                           max_cell_count=aux["max_cell_count"],
                           egrav=egrav, nf_truncated=nf_trunc,
                           rho=aux["rho"], p=aux["p"])

    return step
