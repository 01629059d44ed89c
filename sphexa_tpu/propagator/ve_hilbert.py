"""Multi-chip VE propagator on the Hilbert load-balanced domain.

Same per-stage choreography as ve_sharded.py (reference:
main/src/propagator/ve_hydro.hpp:132-205) but over domain/hilbert.py:
SFC-quantile ranges recomputed every sync, one-hop all_to_all particle
exchange (lossless), bitmap halo discovery to arbitrary peers — the
full analog of the reference's GlobalAssignment + Halos stack instead
of round 1's fixed-width slab ring.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sphexa_tpu.config import INDEX_DTYPE, SphConfig
from sphexa_tpu.domain.hilbert import AXIS, HilbertConfig, hilbert_keys
from sphexa_tpu.domain.slab import _pack
from sphexa_tpu.neighbors import CellGrid
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.propagator.ve_sharded import _sharded_gravity
from sphexa_tpu.sph import hydro_ve
from sphexa_tpu.sph import timestep as ts
from sphexa_tpu.sph.eos import eos_ve, ideal_gas_cv
from sphexa_tpu.sph.kernels import update_h
from sphexa_tpu.sph.positions import position_update, temp_update
from sphexa_tpu.state import Particles, SimState, _FIELDS


class HilbertDiag(NamedTuple):
    dt: jnp.ndarray
    ttot: jnp.ndarray
    etot: jnp.ndarray
    ecin: jnp.ndarray
    eint: jnp.ndarray
    lost: jnp.ndarray        # migration + halo-band losses (must stay 0)
    n_owned: jnp.ndarray     # total alive particles (conservation check)
    max_nc: jnp.ndarray
    h_max: jnp.ndarray
    imbalance: jnp.ndarray   # max rank load / ideal load
    halo_frac: jnp.ndarray   # r_halo / coarse cell edge; must stay <= 1


def _local_step(ps: Particles, dt_prev, box: Box, grid: CellGrid,
                cfg: SphConfig, hc: HilbertConfig):
    """One full step on this device's shard. Runs inside shard_map."""
    # ---- domain sync (reference Domain::sync, domain.hpp:196) ----
    from sphexa_tpu.domain.facade import Domain
    sr = Domain(box, grid, cfg, hc).sync(ps)
    ps = sr.ps
    exts, owned, nl, refresh = sr.exts, sr.owned, sr.nl, sr.refresh
    h_max = sr.h_max
    imbalance, n_own0 = sr.imbalance, sr.n_owned
    r_halo = 2.0 * h_max * 1.3  # slack for in-step h growth

    x, y, z, h = exts.x, exts.y, exts.z, exts.h
    idx, nc = nl.idx, nl.nc

    # ---- pair stages with reference-placed halo refreshes ----
    xm = hydro_ve.compute_xmass(box, x, y, z, h, exts.m, idx, nc, cfg)
    (xm,) = refresh((xm,))

    kx, gradh = hydro_ve.compute_ve_def_gradh(box, x, y, z, h, exts.m, xm,
                                              idx, nc, cfg)
    rho, p, c, prho = eos_ve(exts.temp, exts.m, kx, xm, gradh,
                             cfg.mui, cfg.gamma)
    kx, prho, c = refresh((kx, prho, c))

    iad = hydro_ve.compute_iad_divv_curlv(box, x, y, z, exts.vx, exts.vy,
                                          exts.vz, h, kx, xm, idx, nc, cfg)
    c11, c12, c13, c22, c23, c33, divv = refresh(
        (iad.c11, iad.c12, iad.c13, iad.c22, iad.c23, iad.c33, iad.divv))
    cij = (c11, c12, c13, c22, c23, c33)

    alpha = hydro_ve.compute_av_switches(box, x, y, z, exts.vx, exts.vy,
                                         exts.vz, h, c, kx, xm, divv, cij,
                                         exts.alpha, dt_prev, idx, nc, cfg)
    alpha = jnp.where(owned, alpha, exts.alpha)
    (alpha,) = refresh((alpha,))
    exts = exts.replace(alpha=alpha)

    me = hydro_ve.compute_momentum_energy(box, x, y, z, exts.vx, exts.vy,
                                          exts.vz, h, exts.m, prho, c, cij,
                                          kx, xm, alpha, idx, nc, cfg)
    ax_g, ay_g, az_g = me.ax, me.ay, me.az
    egrav = jnp.float32(0.0)
    govf = jnp.int32(0)
    if cfg.gravG != 0.0:
        # cross-rank self-gravity (global_multipole.hpp:45 analog);
        # with the FMM solver this is the generic hierarchical path
        # (occupancy-dilation boundary bands, O(local + R*band)/device)
        gax, gay, gaz, egrav, govf = _sharded_gravity(ps, box, cfg, AXIS)
        # owned rows of the extended frame carry the gravity force
        gax_e = jnp.concatenate([gax, jnp.zeros((hc.ext - hc.cap,),
                                                gax.dtype)])[sr.perm]
        gay_e = jnp.concatenate([gay, jnp.zeros((hc.ext - hc.cap,),
                                                gay.dtype)])[sr.perm]
        gaz_e = jnp.concatenate([gaz, jnp.zeros((hc.ext - hc.cap,),
                                                gaz.dtype)])[sr.perm]
        ax_g = ax_g + gax_e
        ay_g = ay_g + gay_e
        az_g = az_g + gaz_e
    me = me._replace(ax=ax_g, ay=ay_g, az=az_g)

    # ---- global timestep (MPI_Allreduce MIN -> pmin) ----
    valid = owned & exts.alive
    dt_courant = ts.courant_timestep(me.maxvsignal, h, c, valid, cfg.kcour)
    cands = [dt_courant, ts.rho_timestep(iad.divv, valid, cfg.krho)]
    if cfg.gravG != 0.0:
        cands.append(ts.acceleration_timestep(me.ax, me.ay, me.az, valid,
                                              cfg.eta_acc, cfg.eps))
    dt_local = jnp.stack(cands).min()
    dt = jax.lax.pmin(jnp.minimum(cfg.max_dt_increase * dt_prev, dt_local),
                      AXIS)

    # ---- integrate owned rows ----
    xn, yn, zn, vxn, vyn, vzn, dxn, dyn, dzn = position_update(
        dt, dt_prev, exts.x, exts.y, exts.z, me.ax, me.ay, me.az,
        exts.x_m1, exts.y_m1, exts.z_m1, box,
        h=h, vx=exts.vx, vy=exts.vy, vz=exts.vz)
    temp = temp_update(exts.temp, dt, dt_prev, me.du, exts.du_m1,
                       cfg.mui, cfg.gamma)
    h_new = update_h(cfg.ng0, nl.nc_sph, h)

    exts = exts.replace(x=xn, y=yn, z=zn, vx=vxn, vy=vyn, vz=vzn,
                        x_m1=dxn, y_m1=dyn, z_m1=dzn, temp=temp, h=h_new,
                        du_m1=me.du)

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
    lost_tot = jax.lax.psum(sr.lost, AXIS) + govf  # govf already psum'd
    n_owned = jax.lax.psum(n_own, AXIS)
    max_nc = jax.lax.pmax(nl.max_nc, AXIS)

    diag = HilbertDiag(
        dt=dt, ttot=jnp.float32(0), etot=ecin + eint + egrav, ecin=ecin,
        eint=eint,
        lost=lost_tot, n_owned=n_owned, max_nc=max_nc, h_max=h_max,
        imbalance=imbalance,
        halo_frac=r_halo / (hc.dilate * min(box.lx, box.ly, box.lz)
                            / hc.coarse))
    return ps_new, dt, diag


def make_ve_step_hilbert(box: Box, grid: CellGrid, cfg: SphConfig,
                         hc: HilbertConfig, mesh: Mesh):
    """Jitted sharded step over SimState whose Particles leaves are
    globally [n_ranks * cap], sharded along the domain axis."""

    pspec_particles = Particles(**{f: P(AXIS) for f in _FIELDS})
    pspec_state = SimState(p=pspec_particles, ttot=P(), dt=P(), dt_m1=P(),
                           iteration=P())

    def _sharded(state: SimState):
        ps, dt, diag = _local_step(state.p, state.dt, box, grid, cfg, hc)
        new_state = SimState(p=ps, ttot=state.ttot + dt, dt=dt,
                             dt_m1=state.dt, iteration=state.iteration + 1)
        diag = diag._replace(ttot=state.ttot + dt)
        return new_state, diag

    fn = jax.shard_map(_sharded, mesh=mesh, in_specs=(pspec_state,),
                       out_specs=(pspec_state,
                                  HilbertDiag(*[P()] * len(
                                      HilbertDiag._fields))),
                       check_vma=False)
    jitted = jax.jit(fn)
    rep = NamedSharding(mesh, P())

    def step(state: SimState):
        # Normalize the scalar leaves to committed mesh-replicated
        # arrays so every call shares ONE compiled signature. With two
        # signatures (host scalars on call 0, committed outputs after)
        # the second executable intermittently fails at its 2nd reuse
        # with "supplied 19 buffers but compiled program expected 20"
        # (XLA runtime constant-hoisting bug, seen on CPU meshes).
        put = lambda v, dt: jax.device_put(jnp.asarray(v, dt), rep)
        state = state.replace(
            ttot=put(state.ttot, jnp.float32),
            dt=put(state.dt, jnp.float32),
            dt_m1=put(state.dt_m1, jnp.float32),
            iteration=put(state.iteration, jnp.int32))
        return jitted(state)

    return step


def distribute_hilbert(ps_host: dict, box: Box, hc: HilbertConfig,
                       mesh: Mesh):
    """Host-side initial distribution: Hilbert-sort, quantile-split,
    pad each rank's range to cap."""
    import numpy as np

    x = np.asarray(ps_host["x"], np.float32)
    y = np.asarray(ps_host["y"], np.float32)
    z = np.asarray(ps_host["z"], np.float32)
    keys = np.asarray(hilbert_keys(box, jnp.asarray(x), jnp.asarray(y),
                                   jnp.asarray(z)))
    order = np.argsort(keys, kind="stable")
    n = len(order)
    bounds = [int(round(n * d / hc.n_ranks)) for d in range(hc.n_ranks + 1)]

    shards = {f: [] for f in _FIELDS[:-1]}
    alive_shards = []
    for d in range(hc.n_ranks):
        sel = order[bounds[d]:bounds[d + 1]]
        if len(sel) > hc.cap:
            raise ValueError(f"rank {d} holds {len(sel)} > cap {hc.cap}")
        pad = hc.cap - len(sel)
        for f in _FIELDS[:-1]:
            arr = np.asarray(ps_host[f], np.float32)[sel]
            fill = 1.0 if f == "h" else 0.0
            shards[f].append(np.concatenate(
                [arr, np.full(pad, fill, np.float32)]))
        alive_shards.append(np.concatenate(
            [np.ones(len(sel), bool), np.zeros(pad, bool)]))

    sharding = NamedSharding(mesh, P(AXIS))
    fields = {f: jax.device_put(np.concatenate(shards[f]), sharding)
              for f in _FIELDS[:-1]}
    alive = jax.device_put(np.concatenate(alive_shards), sharding)
    return Particles(alive=alive, **fields)

