"""Multi-chip VE propagator running the Pallas cell-major engine inside
shard_map — the round-2 combination of the production TPU kernels with
the distributed domain (VERDICT item 3).

Design: the *global* cell grid is split into z-plane ranges, one range
per device. Each device bins its owned particles into a local
n x n x nz_local cell-major frame whose z-ghost planes are filled from
the neighbor devices' interior edge planes via a single
lax.ppermute per refresh — the slot-frame analog of the reference's
per-stage exchangeHalos (ve_hydro.hpp:156-187). x/y periodic ghosts
stay device-local (the pallas ghost-refresh kernel). The per-stage
choreography, kernels, and physics are exactly the single-chip
resident engine's (ops/pallas_ve.py); only the refresh callable
changes: refresh = local x/y ghost kernel AFTER the z-plane ppermute,
so ghost-corner slots compose both images correctly.

Halo-correctness condition: a one-plane z halo covers the 2h search
radius because the z cell edge obeys the same >= 2*h_max*slack bound
as the grid itself.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sphexa_tpu.config import SphConfig
from sphexa_tpu.domain.slab import AXIS, SlabConfig, migrate
from sphexa_tpu.propagator.ve_sharded import _sharded_gravity
from sphexa_tpu.ops.cellmajor import (CMGrid, _cell_coords_all, build_layout,
                                      from_cm, interior_mask, to_cm)
from sphexa_tpu.ops.pallas_ve import FILL_POS, PallasVE, make_ghost_refresh
from sphexa_tpu.propagator.ve_pallas import _run_pipeline
from sphexa_tpu.sfc.box import Box, Boundary
from sphexa_tpu.sph import timestep as ts
from sphexa_tpu.sph.eos import ideal_gas_cv
from sphexa_tpu.sph.kernels import update_h
from sphexa_tpu.sph.positions import position_update, temp_update
from sphexa_tpu.state import Particles, SimState, _FIELDS


class PallasShardedDiag(NamedTuple):
    dt: jnp.ndarray
    ttot: jnp.ndarray
    etot: jnp.ndarray
    ecin: jnp.ndarray
    eint: jnp.ndarray
    lost: jnp.ndarray
    n_owned: jnp.ndarray
    max_nc: jnp.ndarray
    h_max: jnp.ndarray
    overflow: jnp.ndarray   # cm slot-cap overflow (must stay 0)


def _zplane_maps(grid: CMGrid):
    """Static slot-index arrays of the four z planes involved in the
    neighbor exchange."""
    cx, cy, cz = _cell_coords_all(grid)
    cap = grid.cap

    def slots(cell_mask):
        cells = np.flatnonzero(cell_mask)
        return jnp.asarray(
            (cells[:, None] * cap + np.arange(cap)[None, :]).reshape(-1)
            .astype(np.int32))

    return dict(lo_ghost=slots(cz == 0),
                lo_edge=slots(cz == 1),
                hi_edge=slots(cz == grid.nz),
                hi_ghost=slots(cz == grid.npz - 1))


def make_ve_step_pallas_sharded(box: Box, grid: CMGrid, cfg: SphConfig,
                                sc: SlabConfig, mesh: Mesh,
                                interpret: bool = False):
    """grid is the per-device local grid (n x n x nz_local); the global
    grid is n x n x (nz_local * n_slabs), plane-aligned with the slab
    boundaries used for migration."""
    D = sc.n_slabs
    W = box.lz / D                    # slab width
    pve = PallasVE(grid, cfg, interpret=interpret)
    box_loc = dataclasses.replace(box, bz=Boundary.open)
    rf_cache = {}

    def rf_xy(stack):
        k = stack.shape[0]
        if k not in rf_cache:
            rf_cache[k] = make_ghost_refresh(grid, box_loc, k,
                                             interpret=interpret,
                                             refresh_z=False)
        return rf_cache[k](stack)

    zmaps = _zplane_maps(grid)
    intmask = interior_mask(grid)
    periodic_z = box.bz == Boundary.periodic

    def zxchg(stack, zrow: int = -1):
        """Fill z-ghost planes from the neighbor devices' edge planes
        (one collective_permute each way)."""
        me = jax.lax.axis_index(AXIS)

        def shift_ring(x, direction):
            perm = [(i, (i + direction) % D) for i in range(D)]
            return jax.lax.ppermute(x, AXIS, perm)

        from_left = shift_ring(stack[:, zmaps["hi_edge"]], +1)
        from_right = shift_ring(stack[:, zmaps["lo_edge"]], -1)
        if zrow >= 0:
            # periodic seam: device 0's left images wrap by -Lz
            sl = jnp.where(me == 0, -box.lz, 0.0).astype(jnp.float32)
            sr = jnp.where(me == D - 1, box.lz, 0.0).astype(jnp.float32)
            from_left = from_left.at[zrow].add(sl)
            from_right = from_right.at[zrow].add(sr)
        if not periodic_z:
            kill_l = (me == 0)
            kill_r = (me == D - 1)
            # open z boundary: outermost devices have no z neighbors.
            # Position stacks are invalidated with FILL_POS; all other
            # stacks get 1.0 — NOT 0.0: the frame contract requires
            # finite divide-safe j rows (volj = xm_j / kx_j in the IAD
            # kernel is 0/0 = NaN on zero fills; w=0 can't mask a NaN)
            kill_val = FILL_POS if zrow >= 0 else 1.0
            from_left = jnp.where(kill_l, kill_val, from_left)
            from_right = jnp.where(kill_r, kill_val, from_right)
        stack = stack.at[:, zmaps["lo_ghost"]].set(from_left)
        stack = stack.at[:, zmaps["hi_ghost"]].set(from_right)
        return stack

    def refresh(stack, fills=None, zrow: int = -1):
        # fills unused: the xy ghost kernel + z-plane exchange rewrite
        # every ghost slot, and interior cells (even empty ones) are
        # written by the pair kernels' own output masking
        return rf_xy(zxchg(stack, zrow=zrow))

    def _local_step(ps: Particles, dt_prev):
        me = jax.lax.axis_index(AXIS)
        ps, lost = migrate(ps, box, sc)

        # bin into the local plane range: fake z maps the slab to the
        # full box so build_layout's normalized binning lands on
        # [0, nz_local)
        z_lo = box.zmin + W * me.astype(jnp.float32)
        z_fake = (ps.z - z_lo) * float(D) + box.zmin
        z_fake = jnp.clip(z_fake, box.zmin, box.zmax - 1e-6 * box.lz)
        layout = build_layout(grid, box_loc, ps.x, ps.y, z_fake,
                              alive=ps.alive)
        validint = layout.valid & intmask

        base = pve.base_rows(layout, ps.x, ps.y, ps.z, ps.h)
        bstack = refresh(jnp.stack(base), zrow=2)
        base = [bstack[i] for i in range(5)]
        cm = lambda f, fill=0.0: to_cm(layout, f, fill)
        jstack = refresh(jnp.stack([cm(ps.m), cm(ps.vx), cm(ps.vy),
                                    cm(ps.vz), cm(ps.temp), cm(ps.alpha)]))
        m, vx, vy, vz, temp, alpha = (jstack[i] for i in range(6))

        out = _run_pipeline(pve, refresh, base, m, vx, vy, vz, temp, alpha,
                            dt_prev, validint)

        # ---- integrate + gather back to the particle frame ----
        n = ps.n
        back = lambda f, fill=0.0: from_cm(layout, f, n, fill)
        ax_p, ay_p, az_p = back(out["ax"]), back(out["ay"]), back(out["az"])
        egrav = jnp.float32(0.0)
        if cfg.gravG != 0.0:
            gax, gay, gaz, egrav, govf = _sharded_gravity(
                ps, box, cfg, AXIS, dim=2)
            lost = lost + govf
            ax_p, ay_p, az_p = ax_p + gax, ay_p + gay, az_p + gaz

        # ---- global dt (pmin = MPI_Allreduce MIN) ----
        dt_courant = ts.courant_timestep(out["maxvsignal"], out["h"],
                                         out["c"], validint, cfg.kcour)
        dt_rho = ts.rho_timestep(out["divv"], validint, cfg.krho)
        dt_local = jnp.minimum(dt_courant, dt_rho)
        if cfg.gravG != 0.0:
            dt_local = jnp.minimum(dt_local, ts.acceleration_timestep(
                ax_p, ay_p, az_p, ps.alive, cfg.eta_acc, cfg.eps))
        dt = jax.lax.pmin(jnp.minimum(cfg.max_dt_increase * dt_prev,
                                      dt_local), AXIS)

        x, y, z, vxn, vyn, vzn, dx, dy, dz = position_update(
            dt, dt_prev, ps.x, ps.y, ps.z, ax_p, ay_p,
            az_p, ps.x_m1, ps.y_m1, ps.z_m1, box,
            h=back(out["h"], 1.0), vx=ps.vx, vy=ps.vy, vz=ps.vz)
        du = back(out["du"])
        temp_n = temp_update(ps.temp, dt, dt_prev, du, ps.du_m1,
                             cfg.mui, cfg.gamma)
        nc_sph = back(out["nc_sph"], 1.0)
        h_n = update_h(cfg.ng0, nc_sph, back(out["h"], 1.0))
        ps = ps.replace(x=x, y=y, z=z, vx=vxn, vy=vyn, vz=vzn,
                        x_m1=dx, y_m1=dy, z_m1=dz, temp=temp_n, h=h_n,
                        du_m1=du, alpha=back(out["alpha"], cfg.alphamin))
        ps = ps.replace(h=jnp.where(ps.alive, ps.h, 1.0))

        # ---- diagnostics ----
        cv = ideal_gas_cv(cfg.mui, cfg.gamma)
        ecin = jax.lax.psum(0.5 * jnp.sum(jnp.where(
            ps.alive, ps.m * (ps.vx ** 2 + ps.vy ** 2 + ps.vz ** 2), 0.0)),
            AXIS)
        eint = jax.lax.psum(jnp.sum(jnp.where(
            ps.alive, ps.m * cv * ps.temp, 0.0)), AXIS)
        diag = PallasShardedDiag(
            dt=dt, ttot=jnp.float32(0), etot=ecin + eint + egrav, ecin=ecin,
            eint=eint, lost=jax.lax.psum(lost, AXIS),
            n_owned=jax.lax.psum(jnp.sum(ps.alive.astype(jnp.int32)), AXIS),
            max_nc=jax.lax.pmax(jnp.max(jnp.where(
                validint, out["nc_sph"] - 1.0, 0.0)), AXIS).astype(jnp.int32),
            h_max=jax.lax.pmax(jnp.max(jnp.where(ps.alive, ps.h, 0.0)),
                               AXIS),
            overflow=jax.lax.psum(layout.overflow.astype(jnp.int32), AXIS))
        return ps, dt, diag

    pspec_particles = Particles(**{f: P(AXIS) for f in _FIELDS})
    pspec_state = SimState(p=pspec_particles, ttot=P(), dt=P(), dt_m1=P(),
                           iteration=P())

    def _sharded(state: SimState):
        ps, dt, diag = _local_step(state.p, state.dt)
        new_state = SimState(p=ps, ttot=state.ttot + dt, dt=dt,
                             dt_m1=state.dt, iteration=state.iteration + 1)
        return new_state, diag._replace(ttot=state.ttot + dt)

    fn = jax.shard_map(_sharded, mesh=mesh, in_specs=(pspec_state,),
                       out_specs=(pspec_state,
                                  PallasShardedDiag(*[P()] * len(
                                      PallasShardedDiag._fields))),
                       check_vma=False)
    return jax.jit(fn)
