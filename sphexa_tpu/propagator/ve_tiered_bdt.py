"""Block time-steps composed with the h-tier zoom grids — the
adaptive-resolution HydroVeBdtProp (reference: the BDT propagator
always runs on the focused octree, main/src/propagator/
ve_hydro_bdt.hpp; rung groups are spatial groups of the adaptive tree,
sph/include/sph/ts_rungs.hpp:117-157). The last pairing of the lever
matrix: BDT x sharding (ve_bdt_sharded), tiers x sharding
(ve_tiered_sharded), gravity x BDT (ve_bdt), and now BDT x tiers.

Design — the particle-frame BDT variant:

  - rungs live per TIER CELL (min over the owner tier's cell — the
    compute-skip granularity of the gated tier kernels, exactly the
    per-warp-group rung rationale of ts_groups.cu at the adaptive
    grid's own resolution: fine cells get fine-grained rung
    independence, coarse cells coarse).
  - a substep runs the five tiered pair stages (_tiered_forces) with
    act gating: only supercells holding an active particle compute;
    the freeze semantics ride the refresh hook — at every merge point
    inactive rows are overwritten from the frozen kick-state store
    (h, xm, kx, gradh, cij, divv, alpha), while the EOS is recomputed
    elementwise from the frozen inputs + the drifted temp (the BdtVE /
    reference stale-halo semantics).
  - integration re-derives (x, v, temp) for ALL particles from the
    per-particle kick state at elapsed time ticks*dt_min and commits
    slots reaching ticks == 2^rung (the drift-back scheme of
    positions_gpu.cu:47-90, as in ve_bdt.py) — on the particle frame,
    so the tier layouts rebuild from the drifted positions each
    substep (the non-resident cadence; tiers re-chosen at host
    boundaries like ve-tiered).
  - gravity recomputed per substep when enabled (ve_hydro_bdt.hpp:
    277-288), committed with the active rungs' kick forces.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from sphexa_tpu.config import SphConfig
from sphexa_tpu.ops.cellmajor import from_cm, interior_mask, to_cm
from sphexa_tpu.ops.pallas_ve import PallasVE
from sphexa_tpu.propagator.ve_tiered import (_build_layouts, _tier_sels,
                                             _tiered_forces,
                                             tier_support_bound)
from sphexa_tpu.sfc.box import Box, put_in_box
from sphexa_tpu.sph.eos import ideal_gas_cv
from sphexa_tpu.sph.kernels import ts_k_courant, update_h
from sphexa_tpu.sph.positions import position_update, temp_update
from sphexa_tpu.state import Particles, SimState
from sphexa_tpu.util.kahan import kahan_sum

_FROZEN = ("h", "xm", "kx", "gradh", "c0", "c1", "c2", "c3", "c4", "c5",
           "divv", "alpha", "ax", "ay", "az", "du", "maxvsignal")


@struct.dataclass
class TBDTState:
    """Particle-frame BDT state: drifted fields + per-particle kick
    state + the frozen dependent-field store + rung bookkeeping."""
    p: Particles           # drifted x/y/z/vx/vy/vz/temp; h/alpha at kick
    # kick state (committed at each particle's last kick)
    xk: jnp.ndarray
    yk: jnp.ndarray
    zk: jnp.ndarray
    tempk: jnp.ndarray
    dxk: jnp.ndarray       # Press-2 displacement history at the kick
    dyk: jnp.ndarray
    dzk: jnp.ndarray
    du_m1k: jnp.ndarray
    dt_m1k: jnp.ndarray    # per-particle previous kick interval
    rung: jnp.ndarray
    ticks: jnp.ndarray
    frozen: dict           # name -> [n] rows (see _FROZEN)
    dt_min: jnp.ndarray
    substep: jnp.ndarray
    ttot: jnp.ndarray
    iteration: jnp.ndarray


class TBDTDiag(NamedTuple):
    dt: jnp.ndarray
    ttot: jnp.ndarray
    etot: jnp.ndarray
    ecin: jnp.ndarray
    eint: jnp.ndarray
    egrav: jnp.ndarray
    active_frac: jnp.ndarray
    rung_hist: jnp.ndarray
    fold: jnp.ndarray      # tier overflow/unowned/clamp/miss fail-stop
    fold_parts: jnp.ndarray  # [overflow, band-unowned, miss, clamped]


class TieredBdtVE:
    """Tiered block-time-step engine. One cycle = 2^(num_rungs-1)
    substeps; use run_cycle() to advance a whole hierarchy."""

    def __init__(self, box: Box, tiers, cfg: SphConfig,
                 num_rungs: int = 4, interpret: bool = False):
        assert not cfg.av_clean, "avClean + BDT not supported yet"
        self.box = box
        self.tiers = tiers
        self.cfg = cfg
        self.num_rungs = num_rungs
        self.engines = [
            (t, PallasVE(t.grid, cfg, interpret=interpret, gated=True),
             interior_mask(t.grid), tier_support_bound(t)) for t in tiers]
        self.substep = jax.jit(self._substep)

    # ---- state management ------------------------------------------------
    def bind(self, state: SimState) -> TBDTState:
        p = state.p
        zero = jnp.zeros_like(p.x)
        frozen = {k: jnp.zeros_like(p.x) for k in _FROZEN}
        frozen["h"] = p.h
        for k in ("xm", "kx", "gradh"):
            frozen[k] = jnp.ones_like(p.x)
        frozen["alpha"] = p.alpha
        return TBDTState(
            p=p, xk=p.x, yk=p.y, zk=p.z, tempk=p.temp,
            dxk=p.x_m1, dyk=p.y_m1, dzk=p.z_m1,
            du_m1k=p.du_m1, dt_m1k=jnp.full_like(p.x, state.dt_m1),
            rung=zero, ticks=zero, frozen=frozen,
            dt_min=jnp.asarray(state.dt, jnp.float32),
            substep=jnp.int32(0),
            ttot=jnp.asarray(state.ttot, jnp.float32),
            iteration=jnp.asarray(state.iteration, jnp.int32))

    def unbind(self, bst: TBDTState) -> SimState:
        return SimState(p=bst.p, ttot=bst.ttot, dt=bst.dt_min,
                        dt_m1=bst.dt_min, iteration=bst.iteration)

    def _tier_cell_min(self, row_pf, ps, sels, layouts, big=1e30):
        """Min-reduce a particle row over each particle's OWNER-tier
        cell (rung harmonization at the adaptive grid's granularity)."""
        out = row_pf
        for ti, (t, pve, intmask, h_bound) in enumerate(self.engines):
            l = layouts[ti]
            v = jnp.where(l.valid & intmask, to_cm(l, row_pf, big), big)
            per_cell = v.reshape(-1, t.grid.cap).min(axis=1)
            cm = jnp.repeat(per_cell, t.grid.cap,
                            total_repeat_length=t.grid.n_slots)
            pf = from_cm(l, cm, ps.n, big)
            out = jnp.where(sels[ti], jnp.minimum(pf, row_pf), out)
        return out

    # ---- one substep -----------------------------------------------------
    def _substep(self, bst: TBDTState):
        cfg = self.cfg
        box = self.box
        ps = bst.p
        alive = ps.alive
        s = bst.substep

        at_kick = bst.ticks < 0.5
        cycle_start = s == 0
        active = alive & (at_kick | cycle_start)
        act_pf = active.astype(jnp.float32)
        frozen = dict(bst.frozen)

        # freeze semantics via the merge-point refresh hook: inactive
        # rows keep their kick values; the store updates as stages land
        def freeze_refresh(d: dict) -> dict:
            out = {}
            for k, v in d.items():
                if k in frozen:
                    v = jnp.where(active, v, frozen[k])
                    frozen[k] = v
                out[k] = v
            return out

        # frame for the pair stages: kick h rides ps.h already
        layouts = _build_layouts(self.engines, box, ps)
        fo = _tiered_forces(ps, bst.dt_min, layouts, self.engines, box,
                            cfg, refresh=freeze_refresh, act_pf=act_pf)

        pick = lambda new, old: jnp.where(active, new, old)
        ax = pick(fo["ax"], frozen["ax"])
        ay = pick(fo["ay"], frozen["ay"])
        az = pick(fo["az"], frozen["az"])
        du = pick(fo["du"], frozen["du"])
        mvs = pick(fo["maxvsignal"], frozen["maxvsignal"])
        egrav = jnp.float32(0.0)
        if cfg.gravG != 0.0:
            # per-substep gravity on the drifted positions, committed
            # with the active kicks (ve_hydro_bdt.hpp:277-288)
            from sphexa_tpu.propagator.ve_pallas import _add_gravity
            g = dict(ax=ax, ay=ay, az=az)
            g, egrav, _nf = _add_gravity(g, ps.x, ps.y, ps.z, ps.m,
                                         alive, box, cfg)
            ax = pick(g["ax"], frozen["ax"])
            ay = pick(g["ay"], frozen["ay"])
            az = pick(g["az"], frozen["az"])
        frozen["ax"], frozen["ay"], frozen["az"] = ax, ay, az
        frozen["du"], frozen["maxvsignal"] = du, mvs

        # ---- rung (re)assignment at cycle start ----
        dt_i = ts_k_courant(mvs, fo["h"], fo["c"], cfg.kcour)
        if cfg.gravG != 0.0:
            acc = jnp.sqrt(ax ** 2 + ay ** 2 + az ** 2)
            dt_i = jnp.minimum(dt_i, cfg.eta_acc * jnp.sqrt(
                cfg.eps / jnp.maximum(acc, 1e-30)))
        dt_i_min = jnp.min(jnp.where(alive, dt_i, 1e30))
        from sphexa_tpu.sph import timestep as _ts
        dt_rho = _ts.rho_timestep(fo["divv"], alive, cfg.krho)
        dt_min_new = jnp.minimum(jnp.minimum(dt_i_min, dt_rho),
                                 cfg.max_dt_increase * bst.dt_min)
        rung_new = jnp.clip(jnp.floor(jnp.log2(
            jnp.maximum(dt_i / jnp.maximum(dt_i_min, 1e-30), 1.0))),
            0.0, float(self.num_rungs - 1))
        sels = _tier_sels(self.engines, ps, ps.h)
        rung_new = self._tier_cell_min(rung_new, ps, sels, layouts)
        rung = jnp.where(cycle_start, rung_new, bst.rung)
        dt_min = jnp.where(cycle_start, dt_min_new, bst.dt_min)
        ticks = jnp.where(cycle_start, 0.0, bst.ticks)

        # ---- drift/kick from the kick state ----
        tau = (ticks + 1.0) * dt_min
        xn, yn, zn, vxn, vyn, vzn, dxn, dyn, dzn = position_update(
            tau, bst.dt_m1k, bst.xk, bst.yk, bst.zk, ax, ay, az,
            bst.dxk, bst.dyk, bst.dzk, box,
            h=fo["h"], vx=ps.vx, vy=ps.vy, vz=ps.vz, fold=False)
        temp_n = temp_update(bst.tempk, tau, bst.dt_m1k, du, bst.du_m1k,
                             cfg.mui, cfg.gamma)

        kick_done = (ticks + 1.0) >= (2.0 ** rung) - 0.5
        pk = lambda new, old: jnp.where(kick_done, new, old)
        # h controller exactly like the plain tiered step: the xmass
        # kernel iterates h in-kernel, then finish_step applies ONE
        # update_h on top (common.py:76) — replicate that for ACTIVE
        # rows (fresh nc; inactive rows keep the frozen kick h). Like
        # plain, the post-update_h value may drift past the tier bound;
        # the NEXT active kernel pass clamp-counts it (committed-mask
        # accounting in _tiered_forces).
        h_new = jnp.where(active,
                          update_h(cfg.ng0, fo["nc_sph"], fo["h"]),
                          fo["h"])
        frozen["h"] = h_new

        xf, yf, zf = put_in_box(box, xn, yn, zn)
        p_new = ps.replace(x=xf, y=yf, z=zf, vx=vxn, vy=vyn, vz=vzn,
                           temp=temp_n, h=h_new, alpha=frozen["alpha"],
                           du_m1=jnp.where(kick_done, du, ps.du_m1),
                           x_m1=dxn, y_m1=dyn, z_m1=dzn)
        new_bst = bst.replace(
            p=p_new,
            xk=pk(xf, bst.xk), yk=pk(yf, bst.yk), zk=pk(zf, bst.zk),
            dxk=pk(dxn, bst.dxk), dyk=pk(dyn, bst.dyk),
            dzk=pk(dzn, bst.dzk), tempk=pk(temp_n, bst.tempk),
            du_m1k=pk(du, bst.du_m1k), dt_m1k=pk(tau, bst.dt_m1k),
            ticks=jnp.where(kick_done, 0.0, ticks + 1.0),
            rung=rung, dt_min=dt_min, frozen=frozen,
            substep=jnp.where(s + 1 >= (1 << (self.num_rungs - 1)),
                              0, s + 1),
            ttot=bst.ttot + dt_min, iteration=bst.iteration + 1)

        # ---- diagnostics ----
        cv = ideal_gas_cv(cfg.mui, cfg.gamma)
        ecin = 0.5 * kahan_sum(jnp.where(
            alive, ps.m * (vxn ** 2 + vyn ** 2 + vzn ** 2), 0.0))
        eint = kahan_sum(jnp.where(alive, ps.m * cv * temp_n, 0.0))
        nvalid = jnp.maximum(jnp.sum(alive), 1).astype(jnp.float32)
        rung_hist = jnp.stack([
            jnp.sum(jnp.where(alive & (jnp.round(rung) == r), 1, 0))
            for r in range(self.num_rungs)])
        diag = TBDTDiag(
            dt=dt_min, ttot=new_bst.ttot, etot=ecin + eint + egrav,
            ecin=ecin, eint=eint, egrav=jnp.asarray(egrav, jnp.float32),
            active_frac=jnp.sum(act_pf) / nvalid,
            rung_hist=rung_hist, fold=fo["fold"].astype(jnp.int32),
            fold_parts=fo["fold_parts"])
        return new_bst, diag

    def run_cycle(self, bst: TBDTState, check: bool = True):
        """One full rung hierarchy; substep 0 reassigns rungs (layouts
        rebuild from the drifted positions every substep — the
        non-resident cadence, re-tier at host boundaries). With
        check=False the caller owns the fold fail-stop (the CLI routes
        it through the main loop's re-tier path instead of raising)."""
        diags = []
        for _ in range(1 << (self.num_rungs - 1)):
            bst, d = self.substep(bst)
            diags.append(d)
        if check and any(int(d.fold) != 0 for d in diags):
            raise RuntimeError(
                f"tiered-BDT fold={max(int(d.fold) for d in diags)} "
                "(overflow/unowned/clamp/miss) — re-tier needed")
        return bst, diags
