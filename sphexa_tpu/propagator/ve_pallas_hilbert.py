"""Load-balanced multi-chip VE on the Pallas cell-major engine:
quantile-balanced SFC column-range domains (the Hilbert-domain x Pallas
combination, restricted to the x-major column curve so rank domains
stay kernel-compatible rectangles).

The reference balances work by splitting a global SFC at particle-count
quantiles (domain/include/cstone/domain/assignment.hpp:55,
domaindecomp.hpp singleRangeSfcSplit) and exchanges halos discovered by
octree collision walks. The TPU-native mapping here:

  SFC                    ->  x-major ordering of the n^2 (x, y) grid
                             COLUMNS: flat id q = ix*n + iy. A rank owns
                             a contiguous column range [S_d, S_{d+1}).
                             Balance granularity is ONE column
                             (~N/n^2 particles, ~0.1-0.3%), vs a whole
                             plane for the fixed-slab ring — this is
                             what makes the decomposition load-balanced
                             on clustered density fields.
  sfcSplit quantiles     ->  psum'd per-column histogram + cumsum
                             searchsorted (recomputed every step)
  exchangeParticles      ->  one jax.lax.all_to_all to the new owners
                             (lossless; capacity overflow is counted
                             and must fail-stop)
  halo discovery + P2P   ->  the halo of a contiguous column range is
                             contained in the neighbors' edge columns:
                             a +-1-ring ppermute of packed particle
                             bands (first/last n+1 owned columns)
  per-stage exchangeHalos -> band re-sends with new payloads on the
                             particle frame (ve_hydro.hpp:156-187); the
                             slot frame is re-materialized from the
                             refreshed rows (to_cm also re-derives all
                             periodic ghost slots, so no separate ghost
                             pass is needed)

Local frames: each rank bins own + halo particles into a CMGrid with a
local x-row window (nxi = rows_cap rows covering global rows
[r0-1, r0-1+rows_cap)), full y and z extent. The Pallas pair kernels
and physics are the single-chip engine's, byte for byte.

Correctness conditions (surfaced in diagnostics / enforced):
  - every rank owns >= n+1 columns (split clamp), so halos come from
    the +-1 ring only;
  - rows_cap covers the widest owned row span + 2 halo rows;
  - cell edge >= 2*h_max (the usual 27-stencil bound);
  - lost == 0 (migration + halo band capacity).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sphexa_tpu.config import INDEX_DTYPE, SphConfig
from sphexa_tpu.domain.hilbert import AXIS, HilbertConfig, migrate
from sphexa_tpu.domain.slab import _pack_indices
from sphexa_tpu.ops.cellmajor import (CMGrid, build_layout, from_cm,
                                      interior_mask, to_cm)
from sphexa_tpu.ops.pallas_ve import PallasVE
from sphexa_tpu.propagator.ve_pallas import _run_pipeline
from sphexa_tpu.propagator.ve_sharded import _sharded_gravity
from sphexa_tpu.sfc.box import Box, Boundary, normalize_coords
from sphexa_tpu.sph import timestep as ts
from sphexa_tpu.sph.eos import ideal_gas_cv
from sphexa_tpu.sph.kernels import update_h
from sphexa_tpu.sph.positions import position_update, temp_update
from sphexa_tpu.state import Particles, SimState, _FIELDS


@dataclasses.dataclass(frozen=True)
class ColDomain:
    """Static shape parameters of the balanced column-range domain."""
    n_ranks: int
    n: int              # global interior cells per x/y dim (and z)
    cap: int            # owned-particle rows per rank
    halo_cap: int       # halo-band particle rows per side
    mig_cap: int        # all_to_all migration rows per (src, dst)
    rows_cap: int = 0   # local x-row window (0 = ceil(n/D) + 4)

    @property
    def rows(self) -> int:
        if self.rows_cap:
            return self.rows_cap
        return -(-self.n // self.n_ranks) + 4

    @property
    def ext(self) -> int:
        return self.cap + 2 * self.halo_cap


class ColDiag(NamedTuple):
    dt: jnp.ndarray
    ttot: jnp.ndarray
    etot: jnp.ndarray
    ecin: jnp.ndarray
    eint: jnp.ndarray
    lost: jnp.ndarray        # migration + halo-band capacity overflow
    n_owned: jnp.ndarray     # this rank's owned count
    n_total: jnp.ndarray
    imbalance: jnp.ndarray   # max_rank(n_owned) / mean - 1
    max_nc: jnp.ndarray
    h_max: jnp.ndarray
    row_span_ok: jnp.ndarray  # owned+halo rows fit rows_cap
    overflow: jnp.ndarray    # cm slot-cap overflow (must stay 0)


def flat_columns(box: Box, n: int, x, y):
    """Global x-major flat column id q = ix*n + iy of each particle."""
    nx, ny, _ = normalize_coords(box, x, y, x)
    ix = jnp.minimum((nx * n).astype(jnp.int32), n - 1)
    iy = jnp.minimum((ny * n).astype(jnp.int32), n - 1)
    return ix * n + iy


def balance_column_splits(q, alive, n: int, n_ranks: int):
    """Quantile split of the global per-column particle histogram —
    singleRangeSfcSplit (domaindecomp.hpp) on the column curve. Returns
    int32 boundaries [D+1] with splits[0]=0, splits[D]=n^2, clamped so
    every rank owns at least n+1 columns (the +-1-ring halo condition).
    """
    ncol = n * n
    hist = jnp.zeros((ncol,), jnp.float32).at[q].add(
        alive.astype(jnp.float32), mode="drop")
    hist = jax.lax.psum(hist, AXIS)
    cum = jnp.cumsum(hist)
    total = cum[-1]
    d = jnp.arange(1, n_ranks, dtype=jnp.float32)
    targets = total * d / n_ranks
    assert ncol >= n_ranks * (n + 1), "too many ranks for this grid"
    inner = jnp.searchsorted(cum, targets, side="left").astype(jnp.int32) + 1
    lo = jnp.arange(1, n_ranks, dtype=jnp.int32) * (n + 1)
    hi = ncol - (n_ranks - jnp.arange(1, n_ranks, dtype=jnp.int32)) * (n + 1)
    inner = jnp.clip(inner, lo, hi)
    # enforce >= n+1 column spacing (forward then backward pass; D is
    # small, so the unrolled scan is cheap)
    for i in range(1, n_ranks - 1):
        inner = inner.at[i].set(jnp.maximum(inner[i], inner[i - 1] + n + 1))
    for i in range(n_ranks - 3, -1, -1):
        inner = inner.at[i].set(jnp.minimum(inner[i], inner[i + 1] - n - 1))
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), inner,
                            jnp.full((1,), ncol, jnp.int32)])


def make_ve_step_pallas_hilbert(box: Box, cd: ColDomain, cap_cell: int,
                                cfg: SphConfig, mesh: Mesh,
                                interpret: bool = False):
    """Build the jitted sharded step. The global grid is n x n x n
    (cubic, from the 2*h_max bound); the local grid per rank is
    rows_cap x n x n."""
    D = cd.n_ranks
    n = cd.n
    grid = CMGrid(n=n, cap=cap_cell, nxi=cd.rows)
    pve = PallasVE(grid, cfg, interpret=interpret)
    box_loc = dataclasses.replace(box, bx=Boundary.open)
    intmask = interior_mask(grid)
    periodic_x = box.bx == Boundary.periodic
    edge = box.lx / n
    H = cd.halo_cap

    def _local_step(ps: Particles, dt_prev):
        me = jax.lax.axis_index(AXIS)

        # ---- assignment + migration (every step, like Domain::sync) ----
        q0 = flat_columns(box, n, ps.x, ps.y)
        splits = balance_column_splits(q0, ps.alive, n, D)
        owner = jnp.searchsorted(splits[1:-1], q0, side="right").astype(
            INDEX_DTYPE)
        hc = HilbertConfig(n_ranks=D, cap=cd.cap, halo_cap=cd.halo_cap,
                           mig_cap=cd.mig_cap)
        ps, lost_mig, n_own = migrate(ps, box, splits, hc, owner=owner)

        s_lo = splits[me]
        s_hi = splits[me + 1]
        r0 = jnp.floor_divide(s_lo, n)
        r_hi = jnp.floor_divide(s_hi - 1, n)

        def ring(x, direction):
            perm = [(i, (i + direction) % D) for i in range(D)]
            return jax.lax.ppermute(x, AXIS, perm)

        # ---- halo bands (+-1 ring), cached index maps for refreshes ----
        q = flat_columns(box, n, ps.x, ps.y)
        lane = jnp.arange(H, dtype=INDEX_DTYPE)
        mask_r = ps.alive & (q >= s_hi - (n + 1))     # -> rank me+1
        mask_l = ps.alive & (q < s_lo + (n + 1))      # -> rank me-1
        idx_r, cnt_r = _pack_indices(mask_r, H)
        idx_l, cnt_l = _pack_indices(mask_l, H)
        lost_halo = (jnp.sum(mask_r.astype(jnp.int32)) - cnt_r
                     + jnp.sum(mask_l.astype(jnp.int32)) - cnt_l)
        sv_r = lane < cnt_r
        sv_l = lane < cnt_l
        # halo validity on the receiver side
        hv_l = ring(sv_r.astype(jnp.float32), +1) > 0.5  # left halo rows
        hv_r = ring(sv_l.astype(jnp.float32), -1) > 0.5  # right halo rows
        if not periodic_x:
            hv_l = hv_l & (me != 0)
            hv_r = hv_r & (me != D - 1)

        def band_refresh(rows, xrow: int = -1):
            """Re-send the halo bands with new payloads; rows live on
            the extended particle frame [cap + 2H]. xrow marks a
            coordinate row receiving the periodic x seam shift."""
            out = []
            for i, f in enumerate(rows):
                pay_r = jnp.where(sv_r, f[idx_r], 0.0)
                pay_l = jnp.where(sv_l, f[idx_l], 0.0)
                got_l = ring(pay_r, +1)
                got_r = ring(pay_l, -1)
                if i == xrow and periodic_x:
                    got_l = got_l + jnp.where(me == 0, -box.lx, 0.0)
                    got_r = got_r + jnp.where(me == D - 1, box.lx, 0.0)
                f = f.at[cd.cap:cd.cap + H].set(
                    jnp.where(hv_l, got_l, f[cd.cap:cd.cap + H]))
                f = f.at[cd.cap + H:].set(
                    jnp.where(hv_r, got_r, f[cd.cap + H:]))
                out.append(f)
            return out

        # ---- extended particle frame: own rows + halo slots ----
        zero_h = jnp.zeros((2 * H,), jnp.float32)
        ext = {f: jnp.concatenate([getattr(ps, f), zero_h])
               for f in _FIELDS[:-1]}
        rows = band_refresh([ext[f] for f in _FIELDS[:-1]],
                            xrow=_FIELDS.index("x"))
        ext = dict(zip(_FIELDS[:-1], rows))
        # the (n+1)-column band can span one x-row more than the stencil
        # needs when a split lands on a row boundary; keep only halo
        # rows in [r0-1, r_hi+1] (the reference's halo discovery sends
        # exactly the collision set; here the receiver trims the
        # over-approximated band)
        r_ext = jnp.floor((ext["x"] - box.xmin) / edge).astype(jnp.int32)
        need = (r_ext >= r0 - 1) & (r_ext <= r_hi + 1)
        hv_l = hv_l & need[cd.cap:cd.cap + H]
        hv_r = hv_r & need[cd.cap + H:]
        ext_alive = jnp.concatenate([ps.alive, hv_l, hv_r])
        ext["h"] = jnp.where(ext_alive, ext["h"], 1.0)
        eps = Particles(alive=ext_alive, **ext)
        owned_row = jnp.concatenate(
            [ps.alive, jnp.zeros((2 * H,), bool)])
        n_ext = cd.ext

        # ---- bin into the local row window ----
        # x_fake maps global rows [r0-1, r0-1+rows_cap) onto the box
        x_fake = box.xmin + ((eps.x - box.xmin) / edge
                             - (r0.astype(jnp.float32) - 1.0)) \
            * (box.lx / float(grid.nx))
        x_fake = jnp.clip(x_fake, box.xmin, box.xmax - 1e-6 * box.lx)
        layout = build_layout(grid, box_loc, x_fake, eps.y, eps.z,
                              alive=ext_alive)
        own_slots = to_cm(layout, owned_row.astype(jnp.float32)) > 0.5
        validint = layout.valid & intmask & own_slots

        # row-span check: the trimmed halo range [r0-1, r_hi+1] must fit
        # the local window rows [r0-1, r0-1+rows_cap)
        span_ok = (r_hi - r0 + 3) <= grid.nx

        base = pve.base_rows(layout, eps.x, eps.y, eps.z, eps.h)
        import os as _os
        if _os.environ.get("HILBERT_DEBUG"):
            jax.debug.print(
                "dbg rank={r} n_ext_alive={a} n_valid={v} n_validint={vi} "
                "base_ok={bo} span={sp} r0={r0} rhi={rh}",
                r=me, a=jnp.sum(ext_alive), v=jnp.sum(layout.valid),
                vi=jnp.sum(validint), bo=jnp.sum(base[0] < 5e7),
                sp=span_ok, r0=r0, rh=r_hi)
        cm = lambda f, fill=0.0: to_cm(layout, f, fill)

        def refresh(stack, fills):
            """Per-stage halo refresh: slot frame -> particle frame ->
            band re-send -> slot frame (to_cm re-derives ghost slots).
            Invalid slots get each row's benign fill — NOT the incoming
            stack values: slots of cells outside this rank's window
            (open-x ghosts, empty rows) carry unwritten pallas output
            memory, which the fold-into-fma pair kernels would read."""
            k = stack.shape[0]
            rows = [from_cm(layout, stack[i], n_ext, f)
                    for i, f in zip(range(k), fills)]
            rows = band_refresh(rows)
            return jnp.stack([cm(r, f) for r, f in zip(rows, fills)])

        out = _run_pipeline(pve, refresh, base, cm(eps.m), cm(eps.vx),
                            cm(eps.vy), cm(eps.vz), cm(eps.temp),
                            cm(eps.alpha), dt_prev, validint)

        # ---- integrate (halo rows dropped afterwards) ----
        back = lambda f, fill=0.0: from_cm(layout, f, n_ext, fill)
        ax_p, ay_p, az_p = back(out["ax"]), back(out["ay"]), back(out["az"])
        egrav = jnp.float32(0.0)
        if cfg.gravG != 0.0:
            gax, gay, gaz, egrav, govf = _sharded_gravity(
                ps, box, cfg, AXIS, dim=0)
            lost_halo = lost_halo + govf
            pad = lambda v: jnp.concatenate([v, zero_h])
            ax_p = ax_p + pad(gax)
            ay_p = ay_p + pad(gay)
            az_p = az_p + pad(gaz)

        dt_courant = ts.courant_timestep(out["maxvsignal"], out["h"],
                                         out["c"], validint, cfg.kcour)
        if _os.environ.get("HILBERT_DEBUG"):
            mv = jnp.where(validint, out["maxvsignal"], 0.0)
            jax.debug.print(
                "dbg2 rank={r} dtprev={dp} dtc={dc} mvs_max={mv} "
                "c_max={c} xm_rng=[{x0},{x1}] kx_rng=[{k0},{k1}] "
                "du_nan={dn} ax_nan={an}",
                r=me, dp=dt_prev, dc=dt_courant, mv=jnp.max(mv),
                c=jnp.max(jnp.where(validint, out["c"], 0.0)),
                x0=jnp.min(jnp.where(validint, out["xm"], 1.0)),
                x1=jnp.max(jnp.where(validint, out["xm"], 0.0)),
                k0=jnp.min(jnp.where(validint, out["kx"], 1.0)),
                k1=jnp.max(jnp.where(validint, out["kx"], 0.0)),
                dn=jnp.sum(jnp.isnan(jnp.where(validint, out["du"], 0.0))),
                an=jnp.sum(jnp.isnan(jnp.where(validint, out["ax"], 0.0))))
        dt_rho = ts.rho_timestep(out["divv"], validint, cfg.krho)
        dt_local = jnp.minimum(dt_courant, dt_rho)
        if cfg.gravG != 0.0:
            dt_local = jnp.minimum(dt_local, ts.acceleration_timestep(
                ax_p, ay_p, az_p, eps.alive, cfg.eta_acc, cfg.eps))
        dt = jax.lax.pmin(jnp.minimum(cfg.max_dt_increase * dt_prev,
                                      dt_local), AXIS)

        x, y, z, vxn, vyn, vzn, dx, dy, dz = position_update(
            dt, dt_prev, eps.x, eps.y, eps.z, ax_p, ay_p, az_p,
            eps.x_m1, eps.y_m1, eps.z_m1, box,
            h=back(out["h"], 1.0), vx=eps.vx, vy=eps.vy, vz=eps.vz)
        du = back(out["du"])
        temp_n = temp_update(eps.temp, dt, dt_prev, du, eps.du_m1,
                             cfg.mui, cfg.gamma)
        nc_sph = back(out["nc_sph"], 1.0)
        h_n = update_h(cfg.ng0, nc_sph, back(out["h"], 1.0))

        sl = lambda v: v[:cd.cap]
        ps = ps.replace(
            x=sl(x), y=sl(y), z=sl(z), vx=sl(vxn), vy=sl(vyn), vz=sl(vzn),
            x_m1=sl(dx), y_m1=sl(dy), z_m1=sl(dz), temp=sl(temp_n),
            h=jnp.where(ps.alive, sl(h_n), 1.0), du_m1=sl(du),
            alpha=sl(back(out["alpha"], cfg.alphamin)))

        # ---- diagnostics ----
        cv = ideal_gas_cv(cfg.mui, cfg.gamma)
        ecin = jax.lax.psum(0.5 * jnp.sum(jnp.where(
            ps.alive, ps.m * (ps.vx ** 2 + ps.vy ** 2 + ps.vz ** 2), 0.0)),
            AXIS)
        eint = jax.lax.psum(jnp.sum(jnp.where(
            ps.alive, ps.m * cv * ps.temp, 0.0)), AXIS)
        n_tot = jax.lax.psum(n_own, AXIS)
        n_max = jax.lax.pmax(n_own, AXIS)
        diag = ColDiag(
            dt=dt, ttot=jnp.float32(0), etot=ecin + eint + egrav,
            ecin=ecin, eint=eint,
            lost=jax.lax.psum(lost_mig + lost_halo, AXIS),
            n_owned=n_max, n_total=n_tot,
            imbalance=n_max.astype(jnp.float32)
            / jnp.maximum(n_tot.astype(jnp.float32) / D, 1.0) - 1.0,
            max_nc=jax.lax.pmax(jnp.max(jnp.where(
                validint, out["nc_sph"] - 1.0, 0.0)), AXIS).astype(
                jnp.int32),
            h_max=jax.lax.pmax(jnp.max(jnp.where(ps.alive, ps.h, 0.0)),
                               AXIS),
            row_span_ok=jnp.all(jax.lax.all_gather(span_ok, AXIS)),
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
                                  ColDiag(*[P()] * len(ColDiag._fields))),
                       check_vma=False)
    return jax.jit(fn)


def distribute_columns(ps_host: dict, box: Box, cd: ColDomain, mesh: Mesh):
    """Host-side initial distribution: balanced column-range split of a
    full particle set, padded to cap per rank."""
    n = cd.n
    x = np.asarray(ps_host["x"], np.float64)
    y = np.asarray(ps_host["y"], np.float64)
    ix = np.clip(((x - box.xmin) / box.lx * n).astype(np.int64), 0, n - 1)
    iy = np.clip(((y - box.ymin) / box.ly * n).astype(np.int64), 0, n - 1)
    q = ix * n + iy
    hist = np.bincount(q, minlength=n * n)
    cum = np.cumsum(hist)
    targets = cum[-1] * np.arange(1, cd.n_ranks) / cd.n_ranks
    inner = np.searchsorted(cum, targets, side="left") + 1
    lo = np.arange(1, cd.n_ranks) * (n + 1)
    hi = n * n - (cd.n_ranks - np.arange(1, cd.n_ranks)) * (n + 1)
    inner = np.maximum.accumulate(np.clip(inner, lo, hi))
    splits = np.concatenate([[0], inner, [n * n]])

    shards = {f: [] for f in _FIELDS[:-1]}
    alive_shards = []
    for d in range(cd.n_ranks):
        sel = np.flatnonzero((q >= splits[d]) & (q < splits[d + 1]))
        if len(sel) > cd.cap:
            raise ValueError(f"rank {d} holds {len(sel)} > cap {cd.cap}")
        pad = cd.cap - len(sel)
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
