"""Multi-chip ADAPTIVE-RESOLUTION propagator: h-tier zoom grids over
the Hilbert load-balanced domain — the distributed focused-octree
composition (reference: the focus tree + LET run on the full MPI
domain, domain/include/cstone/focus/octree_focus_mpi.hpp:51 with
domain.hpp:196 sync; here the VERDICT-r3 "lever composition" item:
tiers were single-chip until now).

Design (one SPMD program, no per-device retracing):

  - particles are Hilbert-quantile balanced and halo-exchanged exactly
    like ve_hilbert (migrate + coarse-bitmap halo discovery) — the
    domain layer is UNCHANGED; tiers compose above it.
  - every device shares the GLOBAL tier structure (TierSpec list from
    the global state at construction/re-tier time) and bins only its
    owned+halo rows into each tier's zoom grid.
  - the pair stages run the GATED Pallas engine (ops/pallas_ve.py
    gated=True, the BDT compute-skip machinery): supercells holding no
    local rows are skipped, so each device pays compute proportional
    to ITS occupancy of the global tier grids, not the global size —
    the distributed analog of the focus tree resolving only the local
    region finely.
  - stage intermediates cross devices through the per-stage halo
    refresh (_tiered_forces' refresh hook = refresh_halo_fields), at
    the reference's exchangeHalos points, and cross tiers through the
    owner-mask merge — both choreographies compose in the particle
    frame.
  - gravity: the cross-rank solver dispatch of ve_sharded
    (_sharded_gravity; hierarchical FMM on any domain shape).

Fail-stops: migration/halo losses, tier slot overflow, unowned rows,
tier-bound h clamps and owner-frame misses all ride the psum'd
diagnostics and must stay zero (re-tier at the host boundary).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sphexa_tpu.config import INDEX_DTYPE, SphConfig
from sphexa_tpu.domain.hilbert import (AXIS, HilbertConfig, balance_splits,
                                       exchange_halos, hilbert_keys, migrate,
                                       refresh_halo_fields)
from sphexa_tpu.domain.slab import _pack
from sphexa_tpu.ops.cellmajor import interior_mask
from sphexa_tpu.ops.pallas_ve import PallasVE
from sphexa_tpu.propagator.ve_sharded import _sharded_gravity
from sphexa_tpu.propagator.ve_tiered import (_build_layouts, _tiered_forces,
                                             tier_support_bound)
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.sph import timestep as ts
from sphexa_tpu.sph.eos import ideal_gas_cv
from sphexa_tpu.sph.positions import position_update, temp_update
from sphexa_tpu.sph.kernels import update_h
from sphexa_tpu.state import Particles, SimState, _FIELDS


class TieredShardDiag(NamedTuple):
    dt: jnp.ndarray
    ttot: jnp.ndarray
    etot: jnp.ndarray
    ecin: jnp.ndarray
    eint: jnp.ndarray
    lost: jnp.ndarray        # migration + halo losses (must stay 0)
    n_owned: jnp.ndarray     # global alive count (conservation)
    fold: jnp.ndarray        # tier overflow+unowned+clamp+miss (psum)
    max_nc: jnp.ndarray
    h_max: jnp.ndarray
    imbalance: jnp.ndarray


def _local_step(ps: Particles, dt_prev, box: Box, engines, cfg: SphConfig,
                hc: HilbertConfig):
    """One step on this device's shard (inside shard_map)."""
    # ---- domain sync-lite: balance + migrate + halos (no cell list —
    # the tier layouts replace the uniform neighbor structure) ----
    keys = hilbert_keys(box, ps.x, ps.y, ps.z)
    splits = balance_splits(keys, ps.alive, hc)
    ps, lost_mig, n_own0 = migrate(ps, box, splits, hc)
    imbalance = jax.lax.pmax(n_own0, AXIS).astype(jnp.float32) \
        * hc.n_ranks / jnp.maximum(
            jax.lax.psum(n_own0, AXIS).astype(jnp.float32), 1.0)

    exts, maps = exchange_halos(ps, box, hc)
    owned = jnp.concatenate([
        ps.alive, jnp.zeros((hc.ext - hc.cap,), bool)])
    halo_refresh = functools.partial(refresh_halo_fields, maps=maps, hc=hc)

    def refresh(d: dict) -> dict:
        keys_ = list(d.keys())
        vals = halo_refresh(tuple(d[k] for k in keys_))
        return dict(zip(keys_, vals))

    # ---- tiered pair stages on the extended frame, device-gated ----
    layouts = _build_layouts(engines, box, exts)
    fo = _tiered_forces(exts, dt_prev, layouts, engines, box, cfg,
                        refresh=refresh, owned=owned)

    ax, ay, az = fo["ax"], fo["ay"], fo["az"]
    egrav = jnp.float32(0.0)
    govf = jnp.int32(0)
    if cfg.gravG != 0.0:
        gax, gay, gaz, egrav, govf = _sharded_gravity(ps, box, cfg, AXIS)
        pad = (jnp.zeros((hc.ext - hc.cap,), gax.dtype),)
        ax = ax + jnp.concatenate([gax, *pad])
        ay = ay + jnp.concatenate([gay, *pad])
        az = az + jnp.concatenate([gaz, *pad])

    # ---- global timestep (pmin — the MPI_Allreduce MIN) ----
    valid = owned & exts.alive
    dt_courant = ts.courant_timestep(fo["maxvsignal"], fo["h"], fo["c"],
                                     valid, cfg.kcour)
    cands = [dt_courant, ts.rho_timestep(fo["divv"], valid, cfg.krho)]
    if cfg.gravG != 0.0:
        cands.append(ts.acceleration_timestep(ax, ay, az, valid,
                                              cfg.eta_acc, cfg.eps))
    dt_local = jnp.stack(cands).min()
    dt = jax.lax.pmin(jnp.minimum(cfg.max_dt_increase * dt_prev, dt_local),
                      AXIS)

    # ---- integrate owned rows ----
    xn, yn, zn, vxn, vyn, vzn, dxn, dyn, dzn = position_update(
        dt, dt_prev, exts.x, exts.y, exts.z, ax, ay, az,
        exts.x_m1, exts.y_m1, exts.z_m1, box,
        h=fo["h"], vx=exts.vx, vy=exts.vy, vz=exts.vz)
    temp = temp_update(exts.temp, dt, dt_prev, fo["du"], exts.du_m1,
                       cfg.mui, cfg.gamma)
    h_new = update_h(cfg.ng0, fo["nc_sph"], fo["h"])

    exts = exts.replace(x=xn, y=yn, z=zn, vx=vxn, vy=vyn, vz=vzn,
                        x_m1=dxn, y_m1=dyn, z_m1=dzn, temp=temp,
                        h=h_new, du_m1=fo["du"], alpha=fo["alpha"])

    # ---- compact owned alive rows back into the [cap] owned layout ----
    fields = [getattr(exts, f) for f in _FIELDS[:-1]]
    packed, n_own = _pack(valid, fields, hc.cap)
    alive = jnp.arange(hc.cap, dtype=INDEX_DTYPE) < n_own
    ps_new = Particles(alive=alive, **dict(zip(_FIELDS[:-1], packed)))
    ps_new = ps_new.replace(h=jnp.where(alive, ps_new.h, 1.0))

    # ---- diagnostics ----
    cv = ideal_gas_cv(cfg.mui, cfg.gamma)
    ecin = jax.lax.psum(0.5 * jnp.sum(jnp.where(
        valid, exts.m * (vxn ** 2 + vyn ** 2 + vzn ** 2), 0.0)), AXIS)
    eint = jax.lax.psum(jnp.sum(jnp.where(valid, exts.m * cv * temp, 0.0)),
                        AXIS)
    h_max = jax.lax.pmax(jnp.max(jnp.where(valid, h_new, 0.0)), AXIS)
    diag = TieredShardDiag(
        dt=dt, ttot=jnp.float32(0), etot=ecin + eint + egrav, ecin=ecin,
        eint=eint,
        lost=jax.lax.psum(lost_mig + maps.send_lost, AXIS) + govf,
        n_owned=jax.lax.psum(n_own, AXIS),
        fold=jax.lax.psum(fo["fold"].astype(jnp.int32), AXIS),
        max_nc=jax.lax.pmax(
            jnp.max(jnp.where(valid, fo["nc_sph"] - 1.0, 0.0)), AXIS),
        h_max=h_max, imbalance=imbalance)
    return ps_new, dt, diag


def make_ve_step_tiered_hilbert(box: Box, tiers, cfg: SphConfig,
                                hc: HilbertConfig, mesh: Mesh,
                                interpret: bool = False):
    """Jitted sharded tiered step over a SimState whose Particles
    leaves are globally [n_ranks * cap], sharded along the domain
    axis. Tier h bounds must cover the field or rows count as unowned
    (fail-stop)."""
    engines = [(t, PallasVE(t.grid, cfg, interpret=interpret, gated=True),
                interior_mask(t.grid), tier_support_bound(t))
               for t in tiers]

    pspec_particles = Particles(**{f: P(AXIS) for f in _FIELDS})
    pspec_state = SimState(p=pspec_particles, ttot=P(), dt=P(), dt_m1=P(),
                           iteration=P())

    def _sharded(state: SimState):
        ps, dt, diag = _local_step(state.p, state.dt, box, engines, cfg,
                                   hc)
        new_state = SimState(p=ps, ttot=state.ttot + dt, dt=dt,
                             dt_m1=state.dt, iteration=state.iteration + 1)
        diag = diag._replace(ttot=state.ttot + dt)
        return new_state, diag

    fn = jax.shard_map(_sharded, mesh=mesh, in_specs=(pspec_state,),
                       out_specs=(pspec_state,
                                  TieredShardDiag(*[P()] * len(
                                      TieredShardDiag._fields))),
                       check_vma=False)
    jitted = jax.jit(fn)
    rep = NamedSharding(mesh, P())

    def step(state: SimState):
        # one compiled signature (see make_ve_step_hilbert)
        put = lambda v, dtp: jax.device_put(jnp.asarray(v, dtp), rep)
        state = state.replace(
            ttot=put(state.ttot, jnp.float32),
            dt=put(state.dt, jnp.float32),
            dt_m1=put(state.dt_m1, jnp.float32),
            iteration=put(state.iteration, jnp.int32))
        return jitted(state)

    return step
