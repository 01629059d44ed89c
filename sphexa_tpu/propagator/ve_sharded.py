"""Multi-chip VE propagator: the single-chip pipeline wrapped in
shard_map over a 1D slab mesh, with migration, halo-band exchange and
per-stage halo field refreshes in the same places the reference puts
its MPI calls (reference: main/src/propagator/ve_hydro.hpp:132-205,
domain/include/cstone/domain/domain.hpp:196-244).

Collective mapping: Allreduce(MIN dt) -> lax.pmin; energy sums ->
lax.psum of compensated partials; halo/domain P2P -> lax.ppermute.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sphexa_tpu.config import INDEX_DTYPE, SphConfig
from sphexa_tpu.domain.slab import (AXIS, SlabConfig, exchange_halos, migrate,
                                    refresh_halo_fields)
from sphexa_tpu.neighbors import CellGrid, build_cell_list, build_neighbor_list
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.sph import hydro_ve
from sphexa_tpu.sph import timestep as ts
from sphexa_tpu.sph.eos import eos_ve, ideal_gas_cv
from sphexa_tpu.sph.kernels import update_h
from sphexa_tpu.sph.positions import position_update, temp_update
from sphexa_tpu.state import Particles, SimState, _FIELDS


class ShardedDiag(NamedTuple):
    dt: jnp.ndarray
    ttot: jnp.ndarray
    etot: jnp.ndarray
    ecin: jnp.ndarray
    eint: jnp.ndarray
    lost: jnp.ndarray        # migration losses (must stay 0)
    n_owned: jnp.ndarray     # total alive particles (conservation check)
    max_nc: jnp.ndarray
    h_max: jnp.ndarray
    halo_frac: jnp.ndarray   # r_halo / slab_width; must stay < 1 for
                             # adjacent-slab halo exchange to be complete


def _local_step(ps: Particles, dt_prev, dt_m1_prev, box: Box, grid: CellGrid,
                cfg: SphConfig, sc: SlabConfig):
    """One full step on this device's shard. Runs inside shard_map."""
    # ---- domain sync: migration + halo bands (reference Domain::sync) ----
    ps, lost = migrate(ps, box, sc)

    h_max = jax.lax.pmax(jnp.max(jnp.where(ps.alive, ps.h, 0.0)), AXIS)
    r_halo = 2.0 * h_max * 1.3  # slack for in-step h growth

    ext, maps = exchange_halos(ps, box, sc, r_halo)
    owned_ext = jnp.concatenate([
        ps.alive,
        jnp.zeros((2 * sc.halo_cap,), bool)])

    # ---- cell sort over the extended frame ----
    cl = build_cell_list(grid, box, ext.x, ext.y, ext.z, alive=ext.alive)
    exts = ext.permute(cl.perm)
    owned = owned_ext[cl.perm]
    inv_perm = jnp.zeros((sc.ext,), INDEX_DTYPE).at[cl.perm].set(
        jnp.arange(sc.ext, dtype=INDEX_DTYPE))

    nl = build_neighbor_list(grid, box, cl, exts.x, exts.y, exts.z, exts.h,
                             cfg, adapt_h=True, alive=exts.alive)
    # halo rows have incomplete neighborhoods: keep their exchanged h and
    # pull the owner-adapted values instead
    h = jnp.where(owned, nl.h, exts.h)
    (h,) = refresh_halo_fields((h,), maps, sc, inv_perm=inv_perm)
    exts = exts.replace(h=h)

    x, y, z = exts.x, exts.y, exts.z
    idx, nc = nl.idx, nl.nc
    refresh = functools.partial(refresh_halo_fields, maps=maps, sc=sc,
                                inv_perm=inv_perm)

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
    egrav = jnp.float32(0.0)
    if cfg.gravG != 0.0:
        # cross-rank self-gravity (global_multipole.hpp:45 analog)
        gax, gay, gaz, egrav, govf = _sharded_gravity(ps, box, cfg, AXIS,
                                                      dim=2)
        pad = jnp.zeros((2 * sc.halo_cap,), gax.dtype)
        me = me._replace(
            ax=me.ax + jnp.concatenate([gax, pad])[cl.perm],
            ay=me.ay + jnp.concatenate([gay, pad])[cl.perm],
            az=me.az + jnp.concatenate([gaz, pad])[cl.perm])

    # ---- global timestep: local mins + pmin (MPI_Allreduce MIN) ----
    valid = owned & exts.alive
    dt_courant = ts.courant_timestep(me.maxvsignal, h, c, valid, cfg.kcour)
    dt_rho = ts.rho_timestep(iad.divv, valid, cfg.krho)
    cands = [dt_courant, dt_rho]
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
    from sphexa_tpu.domain.slab import _pack
    fields = [getattr(exts, f) for f in _FIELDS[:-1]]
    packed, n_own = _pack(valid, fields, sc.cap)
    alive = jnp.arange(sc.cap, dtype=INDEX_DTYPE) < n_own
    ps_new = Particles(alive=alive, **dict(zip(_FIELDS[:-1], packed)))
    ps_new = ps_new.replace(h=jnp.where(alive, ps_new.h, 1.0))

    # ---- diagnostics (psum = MPI_Allreduce SUM) ----
    cv = ideal_gas_cv(cfg.mui, cfg.gamma)
    # guard against 0 * nan from dead/halo rows: mask the full product
    ecin = jax.lax.psum(0.5 * jnp.sum(jnp.where(
        valid, exts.m * (vxn ** 2 + vyn ** 2 + vzn ** 2), 0.0)), AXIS)
    eint = jax.lax.psum(jnp.sum(jnp.where(valid, exts.m * cv * temp, 0.0)),
                        AXIS)
    lost_tot = jax.lax.psum(lost, AXIS)
    if cfg.gravG != 0.0:
        lost_tot = lost_tot + govf   # gravity band/near-field fail-stop
    n_owned = jax.lax.psum(n_own, AXIS)
    max_nc = jax.lax.pmax(nl.max_nc, AXIS)

    diag = ShardedDiag(dt=dt, ttot=jnp.float32(0),
                       etot=ecin + eint + egrav,
                       ecin=ecin, eint=eint, lost=lost_tot,
                       n_owned=n_owned, max_nc=max_nc, h_max=h_max,
                       halo_frac=r_halo / (box.lz / sc.n_slabs))
    return ps_new, dt, diag


def make_ve_step_sharded(box: Box, grid: CellGrid, cfg: SphConfig,
                         sc: SlabConfig, mesh: Mesh):
    """Jitted sharded step over SimState whose Particles leaves are
    globally [n_slabs * cap], sharded along the slab axis."""

    pspec_particles = Particles(**{f: P(AXIS) for f in _FIELDS})
    pspec_state = SimState(p=pspec_particles, ttot=P(), dt=P(), dt_m1=P(),
                           iteration=P())

    def _sharded(state: SimState):
        ps, dt, diag = _local_step(state.p, state.dt, state.dt_m1, box,
                                   grid, cfg, sc)
        new_state = SimState(p=ps, ttot=state.ttot + dt, dt=dt,
                             dt_m1=state.dt, iteration=state.iteration + 1)
        diag = diag._replace(ttot=state.ttot + dt)
        return new_state, diag

    fn = jax.shard_map(_sharded, mesh=mesh, in_specs=(pspec_state,),
                       out_specs=(pspec_state,
                                  ShardedDiag(*[P()] * len(ShardedDiag._fields))),
                       check_vma=False)
    return jax.jit(fn)


def distribute(ps_host: dict, box: Box, sc: SlabConfig, mesh: Mesh,
               extras: dict | None = None):
    """Host-side: bin particles into slabs by z, pad each slab to cap,
    build globally-sharded Particles. ps_host maps field -> numpy array.
    `extras` (name -> array) are additional payload columns distributed
    with the same binning; returned as a second dict when given."""
    import numpy as np

    z = np.asarray(ps_host["z"], np.float64)
    width = box.lz / sc.n_slabs
    slab = np.clip(((z - box.zmin) / width).astype(np.int64), 0,
                   sc.n_slabs - 1)

    cols = dict(ps_host)
    cols.update(extras or {})
    names = list(_FIELDS[:-1]) + list((extras or {}).keys())
    shards = {f: [] for f in names}
    alive_shards = []
    for s in range(sc.n_slabs):
        sel = np.flatnonzero(slab == s)
        if len(sel) > sc.cap:
            raise ValueError(f"slab {s} holds {len(sel)} > cap {sc.cap}")
        pad = sc.cap - len(sel)
        for f in names:
            arr = np.asarray(cols[f], np.float32)[sel]
            fill = 1.0 if f == "h" else 0.0
            shards[f].append(np.concatenate([arr, np.full(pad, fill, np.float32)]))
        alive_shards.append(np.concatenate([np.ones(len(sel), bool),
                                            np.zeros(pad, bool)]))

    sharding = NamedSharding(mesh, P(AXIS))
    fields = {f: jax.device_put(np.concatenate(shards[f]), sharding)
              for f in names}
    alive = jax.device_put(np.concatenate(alive_shards), sharding)
    ps = Particles(alive=alive,
                   **{f: fields[f] for f in _FIELDS[:-1]})
    if extras is None:
        return ps
    return ps, {k: fields[k] for k in extras}


def _sharded_gravity(ps, box, cfg, axis: str, dim: int | None = None):
    """Self-gravity across the mesh. Returns (ax, ay, az, egrav, ovf);
    `ovf` is a psum'd fail-stop counter (near-field truncation + band
    overflow) that must stay 0.

    With `dim` set (1-D spatial decomposition along that axis: z-slabs
    or x-column ranges) and the FMM solver, the HIERARCHICAL exchange
    runs (gravity/fmm.fmm_gravity_sharded): one psum of the dense leaf
    moment grid (~320 KB) + ppermute of the +-1 neighbor near-field
    bands — the computeGlobalMultipoles analog
    (ryoanji/interface/global_multipole.hpp:45-66), with per-device
    memory independent of global N and rank count.

    With `dim=None` (generic domains: Hilbert key ranges, blocks) and
    the FMM solver, the GENERAL hierarchical exchange runs
    (fmm_gravity_sharded_generic): the same psum'd moment grid for the
    far field plus occupancy-dilation boundary bands for the near field
    — one all_gather of compacted surface bands, O(local + R * band)
    per device instead of the former replicated O(N) path.

    Otherwise (direct/ewald solvers) the v1 replicated-source path
    runs: one all_gather of (x, y, z, m) (16 MB/M particles), every
    rank evaluates the full solver and keeps its own rows — same
    physics, O(N)/device memory."""
    import jax as _jax
    import jax.numpy as _jnp

    if cfg.gravity_solver == "fmm" and dim is not None:
        from sphexa_tpu.gravity.fmm import (FmmConfig, fmm_gravity_sharded,
                                            min_level_for_bands)
        n_ranks = _jax.lax.psum(1, axis)
        fc = FmmConfig(min_sep=cfg.fmm_min_sep,
                       level=max(cfg.fmm_level,
                                 min_level_for_bands(n_ranks)))
        ax, ay, az, pot, nf_trunc, band_ovf = fmm_gravity_sharded(
            ps.x, ps.y, ps.z, ps.m, ps.alive, box, cfg.gravG, fc,
            cfg.eps, axis, dim=dim, rings=cfg.gravity_rings)
        egrav_loc = 0.5 * _jnp.sum(_jnp.where(ps.alive, ps.m * pot, 0.0))
        return (ax, ay, az, _jax.lax.psum(egrav_loc, axis),
                nf_trunc + band_ovf)

    if cfg.gravity_solver == "fmm":
        from sphexa_tpu.gravity.fmm import (FmmConfig,
                                            fmm_gravity_sharded_generic)
        fc = FmmConfig(level=cfg.fmm_level, min_sep=cfg.fmm_min_sep)
        ax, ay, az, pot, nf_trunc, band_ovf = fmm_gravity_sharded_generic(
            ps.x, ps.y, ps.z, ps.m, ps.alive, box, cfg.gravG, fc,
            cfg.eps, axis, band_cap=cfg.gravity_band_cap)
        egrav_loc = 0.5 * _jnp.sum(_jnp.where(ps.alive, ps.m * pot, 0.0))
        return (ax, ay, az, _jax.lax.psum(egrav_loc, axis),
                nf_trunc + band_ovf)

    me = _jax.lax.axis_index(axis)
    cap = ps.x.shape[0]
    gx = _jax.lax.all_gather(ps.x, axis).reshape(-1)
    gy = _jax.lax.all_gather(ps.y, axis).reshape(-1)
    gz = _jax.lax.all_gather(ps.z, axis).reshape(-1)
    gm = _jax.lax.all_gather(_jnp.where(ps.alive, ps.m, 0.0),
                             axis).reshape(-1)
    galive = _jax.lax.all_gather(ps.alive, axis).reshape(-1)

    ovf = jnp.int32(0)
    if cfg.gravity_solver == "ewald":
        from sphexa_tpu.gravity.ewald import ewald_gravity
        g = ewald_gravity(gx, gy, gz, gm, galive, box, cfg.gravG,
                          eps=cfg.eps)
    else:
        from sphexa_tpu.gravity.direct import direct_gravity
        g = direct_gravity(gx, gy, gz, gm, galive, cfg.gravG, cfg.eps)

    sl = lambda v: _jax.lax.dynamic_slice(v, (me * cap,), (cap,))
    egrav_loc = 0.5 * _jnp.sum(_jnp.where(ps.alive, ps.m * sl(g.pot), 0.0))
    return (sl(g.ax), sl(g.ay), sl(g.az), _jax.lax.psum(egrav_loc, axis),
            ovf)
