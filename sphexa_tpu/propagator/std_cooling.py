"""std-SPH + radiative cooling propagator
(reference: main/src/propagator/std_hydro_grackle.hpp:151-220 —
std pipeline, optional self-gravity, then chemistry/cooling integration
and a cooling-limited timestep).

Chemistry fields (physics/chemistry.py ChemistryData) relax to the CIE
equilibrium of the cooled temperature each step, the stand-in for the
reference's GRACKLE species integration (cooler_impl.hpp:392)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.neighbors import CellGrid, build_cell_list, build_neighbor_list
from sphexa_tpu.physics.chemistry import ChemistryData, update_chemistry
from sphexa_tpu.physics.cooling import (CoolingParams, cool_particles,
                                        cooling_timestep)
from sphexa_tpu.propagator.common import finish_step
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.sph import hydro_std
from sphexa_tpu.sph.eos import eos_std
from sphexa_tpu.state import SimState


def make_std_cooling_step(box: Box, grid: CellGrid, cfg: SphConfig,
                          params: CoolingParams = CoolingParams(),
                          with_chemistry: bool = False):
    """Returns a jitted step; with_chemistry=True the step takes and
    returns a ChemistryData pytree alongside the SimState (the cell
    sort permutes it with the particles)."""

    @jax.jit
    def step(state: SimState, chem: ChemistryData | None = None):
        ps = state.p
        cl = build_cell_list(grid, box, ps.x, ps.y, ps.z, alive=ps.alive)
        ps = ps.permute(cl.perm)
        if chem is not None:
            chem = jax.tree.map(lambda a: a[cl.perm], chem)
        nl = build_neighbor_list(grid, box, cl, ps.x, ps.y, ps.z, ps.h,
                                 cfg, adapt_h=True, alive=ps.alive)
        ps = ps.replace(h=nl.h)
        x, y, z, h = ps.x, ps.y, ps.z, ps.h
        idx, nc = nl.idx, nl.nc

        rho = hydro_std.compute_density(box, x, y, z, h, ps.m, idx, nc, cfg)
        p, c = eos_std(ps.temp, rho, cfg.mui, cfg.gamma)
        cij = hydro_std.compute_iad_std(box, x, y, z, h, ps.m, rho, idx, nc,
                                        cfg)
        me = hydro_std.compute_momentum_energy_std(
            box, x, y, z, ps.vx, ps.vy, ps.vz, h, ps.m, rho, p, c, cij,
            idx, nc, cfg)
        ax, ay, az = me.ax, me.ay, me.az
        egrav = 0.0
        if cfg.gravG != 0.0:
            # reference: std_hydro_grackle includes self-gravity
            from sphexa_tpu.gravity.direct import egrav as _eg
            if cfg.gravity_solver == "fmm":
                from sphexa_tpu.gravity.fmm import FmmConfig, fmm_gravity
                g = fmm_gravity(x, y, z, ps.m, ps.alive, box, cfg.gravG,
                                FmmConfig(level=cfg.fmm_level,
                                  min_sep=cfg.fmm_min_sep), eps=cfg.eps)
            else:
                from sphexa_tpu.gravity.direct import direct_gravity
                g = direct_gravity(x, y, z, ps.m, ps.alive, cfg.gravG,
                                   cfg.eps)
            ax, ay, az = ax + g.ax, ay + g.ay, az + g.az
            egrav = _eg(ps.m, g.pot, ps.alive)

        # cooling after the hydro forces; temp updated by subcycled
        # integration, and the cooling time limits the global dt
        temp_cooled = cool_particles(ps.temp, rho, state.dt, cfg, params)
        temp_cooled = jnp.where(ps.alive, temp_cooled, ps.temp)
        ps = ps.replace(temp=temp_cooled)
        if chem is not None:
            chem = update_chemistry(chem, temp_cooled * params.temp_to_k,
                                    ps.alive)
        dt_cool = cooling_timestep(
            jnp.where(ps.alive, ps.temp, 1e8), rho, cfg, params)

        new_state, diag = finish_step(
            state, ps, ax, ay, az, me.du, me.maxvsignal, c, None,
            nl.nc_sph, box, cfg, max_nc=nl.max_nc,
            max_cell_count=nl.max_cell_count, egrav=egrav)
        dt = jnp.minimum(diag.dt, dt_cool)
        new_state = new_state.replace(dt=dt)
        diag = diag._replace(dt=dt)
        if chem is not None:
            return new_state, diag, chem
        return new_state, diag

    return step
