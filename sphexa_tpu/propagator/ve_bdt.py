"""Block / individual time-steps on the resident Pallas engine — the
HydroVeBdtProp analog (reference: main/src/propagator/ve_hydro_bdt.hpp,
sph/include/sph/ts_rungs.hpp:117-157, timestep.h:17-34).

TPU-native redesign of the reference's scheme:

  - Rungs are assigned per *cell* (min over resident particles), the
    direct analog of the reference's per-warp-group rungs
    (ts_groups.cu): the pair kernels gate whole supercells, so rung
    granularity = compute-skip granularity.
  - A cycle = 2^(numRungs-1) substeps of dt_min. At substep s the
    particles with s % 2^rung == 0 are at their kick points: the five
    pair stages recompute ONLY supercells containing such particles
    (pl.when skip in the gated kernels); everyone else's forces and
    dependent fields (xm, kx, cij, divv, alpha, c, prho, rho) stay
    frozen at their last kick values — exactly the reference's
    stale-halo semantics for inactive rungs.
  - Integration keeps per-slot *kick state* (positions/velocities/temp
    and the Press-2 history at the last kick). Each substep re-derives
    x, v, temp for ALL slots from the kick state at elapsed time
    ticks*dt_min (second-order drift — the reference's drift-back
    kernel, positions_gpu.cu:47-90, with the recover step replaced by
    storing the kick state, which is cheap on TPU); slots reaching
    ticks == 2^rung commit the advance as their new kick state.

Rung assignment (cycle start, all-active full step):
    dt_i = Kcour * h_i / vsig_i,  dt_min = min_i dt_i (growth-clamped),
    rung_i = clip(floor(log2(dt_i / dt_min)), 0, numRungs-1),
    then min-reduced over each cell.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from sphexa_tpu.config import SphConfig
from sphexa_tpu.ops.cellmajor import CMGrid, interior_mask
from sphexa_tpu.ops.pallas_ve import FILL_POS, PallasVE
from sphexa_tpu.propagator.ve_pallas import (ResidentVE, RVState,
                                             _run_pipeline)
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.sph.eos import eos_ve, ideal_gas_cv
from sphexa_tpu.sph.kernels import ts_k_courant, update_h
from sphexa_tpu.sph.positions import position_update, temp_update
from sphexa_tpu.state import SimState
from sphexa_tpu.util.kahan import kahan_sum


@struct.dataclass
class BDTState:
    rv: RVState            # resident rows; x/v/temp are the DRIFTED values
    # per-slot kick state (values committed at the slot's last kick)
    xk: jnp.ndarray
    yk: jnp.ndarray
    zk: jnp.ndarray
    tempk: jnp.ndarray
    dxk: jnp.ndarray       # Press-2 displacement history at the kick
    dyk: jnp.ndarray
    dzk: jnp.ndarray
    axk: jnp.ndarray       # acceleration committed at the kick
    ayk: jnp.ndarray
    azk: jnp.ndarray
    duk: jnp.ndarray
    du_m1k: jnp.ndarray
    dt_m1k: jnp.ndarray    # per-slot previous kick interval
    rung: jnp.ndarray      # per-slot rung (cell-harmonized), f32
    ticks: jnp.ndarray     # substeps since last kick, f32
    # frozen dependent fields (last kick values, used as j-inputs)
    xm: jnp.ndarray
    kx: jnp.ndarray
    gradh: jnp.ndarray
    c11: jnp.ndarray
    c12: jnp.ndarray
    c13: jnp.ndarray
    c22: jnp.ndarray
    c23: jnp.ndarray
    c33: jnp.ndarray
    divv: jnp.ndarray
    dt_min: jnp.ndarray    # cycle base timestep
    substep: jnp.ndarray   # position within the cycle, i32


class BDTDiag(NamedTuple):
    dt: jnp.ndarray
    ttot: jnp.ndarray
    etot: jnp.ndarray
    ecin: jnp.ndarray
    eint: jnp.ndarray
    active_frac: jnp.ndarray     # fraction of particles recomputed
    active_cell_frac: jnp.ndarray
    rung_hist: jnp.ndarray       # [numRungs] particle counts
    overflow: jnp.ndarray


class BdtVE(ResidentVE):
    """Resident engine with per-cell block time-steps. One cycle =
    `2**(num_rungs-1)` calls of .substep(); use .run_cycle() to advance
    a whole hierarchy."""

    def __init__(self, box: Box, grid: CMGrid, cfg: SphConfig,
                 num_rungs: int = 4, interpret: bool = False):
        super().__init__(box, grid, cfg, interpret=interpret)
        self.num_rungs = num_rungs
        self.pve_gated = PallasVE(grid, cfg, interpret=interpret, gated=True)
        # no donation: BDTState leaves alias at bind (xk = rv.x),
        # and donating aliased buffers invalidates the survivors
        self.substep = jax.jit(self._substep)

    # ---- global-reduction hooks: identity single-chip; the sharded
    # subclass (ve_bdt_sharded.ShardedBdtVE) swaps in pmin/pmax/psum —
    # the MPI_Allreduce points of the reference BDT propagator
    # (ve_hydro_bdt.hpp:224-289 computeMinTimestep/rungs) ---------------
    def _gmin(self, v):
        return v

    def _gmax(self, v):
        return v

    def _gsum(self, v):
        return v

    def _gravity(self, out, x, y, z, m, valid):
        """Per-substep self-gravity on the drifted positions
        (ve_hydro_bdt.hpp:277-288). Single-chip: the local solver over
        the full frame; the sharded subclass swaps in the hierarchical
        cross-rank solver. Returns (out, egrav, fail_count)."""
        from sphexa_tpu.propagator.ve_pallas import _add_gravity
        out, egrav, nf = _add_gravity(out, x, y, z, m, valid,
                                      self.box, self.cfg)
        return out, self._gsum(egrav), jnp.int32(nf)

    # ---- state management -------------------------------------------------
    def bind_bdt(self, state: SimState) -> BDTState:
        rv = self.bind(state)
        zero = jnp.zeros_like(rv.x)
        one = jnp.ones_like(rv.x)
        return BDTState(
            rv=rv, xk=rv.x, yk=rv.y, zk=rv.z, tempk=rv.temp,
            dxk=rv.x_m1, dyk=rv.y_m1, dzk=rv.z_m1,
            axk=zero, ayk=zero, azk=zero, duk=zero, du_m1k=rv.du_m1,
            dt_m1k=jnp.full_like(rv.x, state.dt_m1),
            rung=zero, ticks=zero,
            xm=one, kx=one, gradh=one, c11=zero, c12=zero, c13=zero,
            c22=zero, c23=zero, c33=zero, divv=zero,
            dt_min=state.dt, substep=jnp.int32(0))

    def _cell_min(self, row, validint, big=1e30):
        """Min-reduce a slot row over each cell (rung harmonization —
        the per-group reduction of the reference's ts_groups.cu)."""
        v = jnp.where(validint, row, big)
        per_cell = v.reshape(-1, self.grid.cap).min(axis=1)
        return jnp.repeat(per_cell, self.grid.cap, total_repeat_length=
                          self.grid.n_slots)

    def _resync_1chip(self, bst: BDTState):
        """Cycle-start full layout rebin — the single-chip analog of the
        reference's sync() at every cycle start (ve_hydro_bdt.hpp:178)
        and of ShardedBdtVE.resync. Called at substep == 0, where every
        slot sits at its kick point (kick state == rv state), so the
        only per-slot BDT row that must ride the re-binning is dt_m1k;
        frozen fields are rebuilt by the all-active first substep."""
        from sphexa_tpu.ops.cellmajor import build_layout, to_cm
        from sphexa_tpu.propagator.ve_pallas import _RVROWS
        from sphexa_tpu.sfc.box import put_in_box
        rv = bst.rv
        x, y, z = put_in_box(self.box, rv.x, rv.y, rv.z)
        alive = rv.valid & self.intmask
        layout = build_layout(self.grid, self.box, x, y, z, alive=alive)
        fields = {f: getattr(rv, f) for f in _RVROWS}
        fields.update(x=x, y=y, z=z)
        scalars = dict(
            drift=jnp.float32(0.0),
            overflow=rv.overflow + layout.overflow.astype(jnp.int32),
            ttot=rv.ttot, dt=rv.dt, dt_m1=rv.dt_m1,
            iteration=rv.iteration)
        rv2 = self._gather(layout, fields, scalars, rv.gid)
        dt_m1k_cm = to_cm(layout, bst.dt_m1k, fill=1.0)
        zero = jnp.zeros_like(rv2.x)
        one = jnp.ones_like(rv2.x)
        new = BDTState(
            rv=rv2, xk=rv2.x, yk=rv2.y, zk=rv2.z, tempk=rv2.temp,
            dxk=rv2.x_m1, dyk=rv2.y_m1, dzk=rv2.z_m1,
            axk=zero, ayk=zero, azk=zero, duk=zero, du_m1k=rv2.du_m1,
            dt_m1k=jnp.where(rv2.valid, dt_m1k_cm, 1.0),
            rung=zero, ticks=zero,
            xm=one, kx=one, gradh=one, c11=zero, c12=zero, c13=zero,
            c22=zero, c23=zero, c33=zero, divv=zero,
            dt_min=bst.dt_min, substep=jnp.int32(0))
        return new, jnp.int32(0)

    def resync(self, bst: BDTState):
        """Jitted cycle-start sync; returns (state, lost) — lost is
        always 0 single-chip (no migration), kept for interface parity
        with ShardedBdtVE.resync."""
        if getattr(self, "_resync_jit", None) is None:
            self._resync_jit = jax.jit(self._resync_1chip)
        return self._resync_jit(bst)

    # ---- one substep -------------------------------------------------------
    def _substep(self, bst: BDTState, phases_real=None, phases_imag=None):
        cfg = self.cfg
        rv = bst.rv
        validint = rv.valid & self.intmask
        s = bst.substep

        # kick points: slots whose tick counter wrapped to zero
        at_kick = bst.ticks < 0.5
        cycle_start = s == 0
        active = validint & (at_kick | cycle_start)
        act_row = active.astype(jnp.float32)

        # ---- gated force pipeline: frozen fields ride as prev outputs ----
        assert not cfg.av_clean, "avClean + BDT not supported yet"
        base = [rv.x, rv.y, rv.z, rv.h, rv.gid]
        refresh = lambda st, fills=None: self.rf(st.shape[0])(st)
        out = _run_pipeline_gated(
            self.pve_gated, refresh, base, rv.m, rv.vx, rv.vy, rv.vz,
            rv.temp, rv.alpha, bst.dt_min, validint, act_row,
            prev=dict(xm=bst.xm, h=rv.h, kx=bst.kx, gradh=bst.gradh,
                      cij=(bst.c11, bst.c12, bst.c13, bst.c22, bst.c23,
                           bst.c33), divv=bst.divv, alpha=rv.alpha,
                      ax=bst.axk, ay=bst.ayk, az=bst.azk, du=bst.duk),
            cfg=cfg)

        if phases_real is not None:
            # turbulence stirring on the active rungs (reference
            # TurbVeBdtProp, turb_ve.hpp:114-118: driveTurbulence after
            # the force step); committed with the kick acceleration
            from sphexa_tpu.physics.turbulence import stir_accelerations
            sax, say, saz = stir_accelerations(
                rv.x, rv.y, rv.z, self._turb_modes, phases_real,
                phases_imag, self._turb_amps, self._turb_norm)
            out = dict(out, ax=out["ax"] + sax, ay=out["ay"] + say,
                       az=out["az"] + saz)

        # self-gravity recomputed every substep from the drifted
        # positions and committed with the active rungs' kick forces —
        # the reference's per-substep upsweep+traverse
        # (ve_hydro_bdt.hpp:277-288; inactive rungs keep their frozen
        # kick acceleration, gravity included)
        egrav = jnp.float32(0.0)
        grav_nf = jnp.int32(0)
        if cfg.gravG != 0.0:
            out, egrav, grav_nf = self._gravity(out, rv.x, rv.y, rv.z,
                                                rv.m, validint)

        # per-slot freeze/commit (exact semantics; the kernel gate is the
        # compute-skip at supercell granularity)
        pick = lambda new, old: jnp.where(active, new, old)
        axk = pick(out["ax"], bst.axk)
        ayk = pick(out["ay"], bst.ayk)
        azk = pick(out["az"], bst.azk)
        duk = pick(out["du"], bst.duk)
        xm = pick(out["xm"], bst.xm)
        kx = pick(out["kx"], bst.kx)
        gradh = pick(out["gradh"], bst.gradh)
        cij = tuple(pick(o, p) for o, p in zip(
            (out["c11"], out["c12"], out["c13"], out["c22"], out["c23"],
             out["c33"]),
            (bst.c11, bst.c12, bst.c13, bst.c22, bst.c23, bst.c33)))
        divv = pick(out["divv"], bst.divv)
        alpha = pick(out["alpha"], rv.alpha)
        h = pick(out["h"], rv.h)

        # ---- rung (re)assignment at cycle start ----
        # rung ratios are relative to the UNclamped min particle dt
        # (reference: rungTimestep computes rungRanges from minDtGlobal
        # BEFORE applying maxDt, ts_rungs.hpp:134-146); the growth clamp
        # and the global rho candidate only shrink the stepping base
        dt_i = ts_k_courant(out["maxvsignal"], h, out["c"], cfg.kcour)
        if cfg.gravG != 0.0:
            # per-particle acceleration limit (reference
            # groupAccTimestep, ve_hydro_bdt.hpp:289; ts_global.hpp:46)
            acc = jnp.sqrt(out["ax"] ** 2 + out["ay"] ** 2
                           + out["az"] ** 2)
            dt_acc = cfg.eta_acc * jnp.sqrt(
                cfg.eps / jnp.maximum(acc, 1e-30))
            dt_i = jnp.minimum(dt_i, dt_acc)
        dt_i_min = self._gmin(jnp.min(jnp.where(validint, dt_i, 1e30)))
        from sphexa_tpu.sph import timestep as _ts
        dt_rho = self._gmin(_ts.rho_timestep(out["divv"], validint,
                                             cfg.krho))
        dt_min_new = jnp.minimum(jnp.minimum(dt_i_min, dt_rho),
                                 cfg.max_dt_increase * bst.dt_min)
        rung_new = jnp.clip(jnp.floor(jnp.log2(
            jnp.maximum(dt_i / jnp.maximum(dt_i_min, 1e-30), 1.0))),
            0.0, float(self.num_rungs - 1))
        rung_new = self._cell_min(rung_new, validint)
        rung = jnp.where(cycle_start, rung_new, bst.rung)
        dt_min = jnp.where(cycle_start, dt_min_new, bst.dt_min)
        ticks = jnp.where(cycle_start, 0.0, bst.ticks)

        # ---- drift/kick: re-derive everyone from the kick state ----
        tau = (ticks + 1.0) * dt_min
        xn, yn, zn, vxn, vyn, vzn, dxn, dyn, dzn = position_update(
            tau, bst.dt_m1k, bst.xk, bst.yk, bst.zk, axk, ayk, azk,
            bst.dxk, bst.dyk, bst.dzk, self.box,
            h=h, vx=rv.vx, vy=rv.vy, vz=rv.vz, fold=False)
        temp_n = temp_update(bst.tempk, tau, bst.dt_m1k, duk, bst.du_m1k,
                             cfg.mui, cfg.gamma)

        kick_done = (ticks + 1.0) >= (2.0 ** rung) - 0.5
        pickk = lambda new, old: jnp.where(kick_done, new, old)
        new_bst = bst.replace(
            xk=pickk(xn, bst.xk), yk=pickk(yn, bst.yk), zk=pickk(zn, bst.zk),
            dxk=pickk(dxn, bst.dxk), dyk=pickk(dyn, bst.dyk),
            dzk=pickk(dzn, bst.dzk), tempk=pickk(temp_n, bst.tempk),
            du_m1k=pickk(duk, bst.du_m1k),
            dt_m1k=pickk(tau, bst.dt_m1k),
            axk=axk, ayk=ayk, azk=azk, duk=duk,
            ticks=jnp.where(kick_done, 0.0, ticks + 1.0),
            rung=rung, dt_min=dt_min,
            substep=jnp.where(s + 1 >= (1 << (self.num_rungs - 1)),
                              0, s + 1),
            xm=xm, kx=kx, gradh=gradh, c11=cij[0], c12=cij[1], c13=cij[2],
            c22=cij[3], c23=cij[4], c33=cij[5], divv=divv)

        # h controller at the particle's ACTIVE substep (its kick
        # point, where nc_sph is freshly counted) — committing at
        # kick_done instead reads the GATED nc of an inactive
        # supercell (zero -> update_h inflates h by ~1.6x per cycle
        # for rungs >= 1; found by per-rung h audits)
        h_new = jnp.where(active,
                          update_h(cfg.ng0, out["nc_sph"], h), h)

        # drift accounting + ghost refresh of the mutated rows
        disp2 = ((xn - rv.x) ** 2 + (yn - rv.y) ** 2 + (zn - rv.z) ** 2)
        step_disp = self._gmax(
            jnp.sqrt(jnp.max(jnp.where(validint, disp2, 0.0))))
        st = self.rf(12, xyz_rows=(0, 1, 2))(jnp.stack(
            [xn, yn, zn, h_new, vxn, vyn, vzn, temp_n, duk, dxn, dyn, dzn]))
        rv = rv.replace(
            x=st[0], y=st[1], z=st[2], h=st[3], vx=st[4], vy=st[5],
            vz=st[6], temp=st[7], du_m1=st[8], x_m1=st[9], y_m1=st[10],
            z_m1=st[11], alpha=alpha, drift=rv.drift + step_disp,
            ttot=rv.ttot + dt_min, dt=dt_min, dt_m1=bst.dt_min,
            iteration=rv.iteration + 1)
        new_bst = new_bst.replace(rv=rv)

        # ---- diagnostics ----
        cv = ideal_gas_cv(cfg.mui, cfg.gamma)
        ecin = self._gsum(0.5 * kahan_sum(jnp.where(
            validint, rv.m * (rv.vx ** 2 + rv.vy ** 2 + rv.vz ** 2), 0.0)))
        eint = self._gsum(kahan_sum(jnp.where(
            validint, rv.m * cv * rv.temp, 0.0)))
        nvalid = jnp.maximum(self._gsum(jnp.sum(validint)),
                             1).astype(jnp.float32)
        # per-cell activity: a cell recomputes if any slot is active
        cell_act = (act_row.reshape(-1, self.grid.cap).max(axis=1))
        cell_occ = validint.reshape(-1, self.grid.cap).any(axis=1)
        rung_hist = self._gsum(jnp.stack([
            jnp.sum(jnp.where(validint & (jnp.round(rung) == r), 1, 0))
            for r in range(self.num_rungs)]))
        diag = BDTDiag(
            dt=dt_min, ttot=rv.ttot, etot=ecin + eint + egrav, ecin=ecin,
            eint=eint,
            active_frac=self._gsum(jnp.sum(act_row)) / nvalid,
            active_cell_frac=(self._gsum(jnp.sum(cell_act))
                              / jnp.maximum(self._gsum(jnp.sum(cell_occ)),
                                            1)),
            rung_hist=rung_hist, overflow=rv.overflow + grav_nf)
        return new_bst, diag

    def run_cycle(self, bst: BDTState):
        """Full cycle-start sync (layout rebin), then one rung hierarchy
        (2^(numRungs-1) substeps) — the sync()-every-cycle cadence of
        the reference BDT propagator (ve_hydro_bdt.hpp:171-212)."""
        bst, _ = self.resync(bst)
        diags = []
        for _ in range(1 << (self.num_rungs - 1)):
            bst, d = self.substep(bst)
            diags.append(d)
        return bst, diags

    # ---- rung-state checkpointing (reference: sph/timestep.h:29-34
    # loadOrStore persists the Timestep struct so a restarted BDT run
    # resumes the SAME rung assignment instead of re-deriving it) ------
    def checkpoint_rungs(self, bst: BDTState, n_capacity: int) -> dict:
        """Particle-frame rung state. Call at a cycle boundary
        (bst.substep == 0), where every slot sits at its kick point so
        the kick state coincides with the checkpointed fields."""
        assert int(bst.substep) == 0, \
            "BDT checkpoints only at cycle boundaries (full sync)"
        rv = bst.rv
        validint = rv.valid & self.intmask
        idx = jnp.where(validint, rv.gid, float(n_capacity)).astype(
            jnp.int32)

        def back(row, fill=0.0):
            out = jnp.full((n_capacity,), fill, row.dtype)
            return out.at[idx].set(jnp.where(validint, row, fill),
                                   mode="drop")

        return {"fields": {"bdt_rung": back(bst.rung),
                           "bdt_dt_m1k": back(bst.dt_m1k)},
                "attrs": {"bdt_dt_min": float(bst.dt_min),
                          "bdt_num_rungs": self.num_rungs}}

    def restore_rungs(self, bst: BDTState, rung_pf, dt_m1k_pf,
                      dt_min: float) -> BDTState:
        """Install checkpointed rung state into a freshly bound
        BDTState (particle-frame arrays are alive-packed in the same
        order bind() consumed)."""
        rv = bst.rv
        gid = jnp.where(rv.valid, rv.gid, 0.0).astype(jnp.int32)
        rung_cm = jnp.asarray(rung_pf)[gid]
        dt_m1k_cm = jnp.asarray(dt_m1k_pf)[gid]
        validint = rv.valid & self.intmask
        # re-harmonize per cell (slots may land in different cells than
        # at save time after the rebind's fold)
        rung_cm = self._cell_min(rung_cm, validint)
        return bst.replace(rung=jnp.where(validint, rung_cm, 0.0),
                           dt_m1k=jnp.where(validint, dt_m1k_cm,
                                            jnp.float32(dt_min)),
                           ticks=jnp.zeros_like(bst.ticks),
                           dt_min=jnp.float32(dt_min),
                           substep=jnp.int32(0))


class TurbBdtVE(BdtVE):
    """Turbulence-stirred block-time-step propagator (reference:
    TurbVeBdtProp, main/src/propagator/turb_ve.hpp:114-118). The OU
    noise advances on the host once per substep with the cycle base dt;
    the projected phases enter the jitted substep as traced arguments
    and the stirring acceleration is committed with the kick forces of
    the active rungs."""

    def __init__(self, box: Box, grid: CMGrid, cfg: SphConfig,
                 turb=None, num_rungs: int = 4, interpret: bool = False,
                 verbose: bool = False):
        from sphexa_tpu.physics.turbulence import TurbulenceData
        self.turb = turb or TurbulenceData.create(verbose=verbose)
        self._turb_modes = jnp.asarray(self.turb.modes, jnp.float32)
        self._turb_amps = jnp.asarray(self.turb.amplitudes, jnp.float32)
        self._turb_norm = self.turb.sol_weight_norm
        super().__init__(box, grid, cfg, num_rungs=num_rungs,
                         interpret=interpret)

    def run_cycle(self, bst: BDTState):
        bst, _ = self.resync(bst)
        diags = []
        for _ in range(1 << (self.num_rungs - 1)):
            self.turb.update_noise(float(bst.dt_min))
            pr, pi = self.turb.projected_phases()
            bst, d = self.substep(bst, pr, pi)
            diags.append(d)
        return bst, diags


def _run_pipeline_gated(pve: PallasVE, refresh, base, m, vx, vy, vz, temp,
                        alpha, dt, validint, act_row, prev, cfg):
    """The five pair stages with supercell gating: inactive supercells
    copy their frozen previous outputs instead of recomputing."""
    gate = lambda *prevs: (act_row, prevs)
    zero = jnp.zeros_like(m)

    xm, h_new, nc, nonconv = pve.xmass_h(
        base, m, gate=gate(prev["xm"], prev["h"], zero, zero))
    h_new = jnp.where(validint, h_new, base[3])
    st = refresh(jnp.stack([xm, h_new]), (1.0, 1.0))
    xm, h_new = st[0], st[1]
    base = [base[0], base[1], base[2], h_new, base[4]]
    nc_sph = nc + 1.0

    kx, gradh = pve.gradh(base, m, xm, gate=gate(prev["kx"], prev["gradh"]))
    st = refresh(jnp.stack([kx, gradh]), (1.0, 1.0))
    kx, gradh = st[0], st[1]

    rho, p, c, prho = eos_ve(temp, m, kx, xm, gradh, cfg.mui, cfg.gamma)
    # frame contract: invalid slots stream finite, divide-safe values
    # (see propagator/ve_pallas.py)
    va = base[0] < 0.5 * FILL_POS
    rho = jnp.where(va, rho, 1.0)
    c = jnp.where(va, c, 1.0)
    prho = jnp.where(va, prho, 0.0)

    pc = prev["cij"]
    cij, divv, curlv, gradv = pve.iad_divv(
        base, kx, xm, vx, vy, vz,
        gate=gate(*pc, prev["divv"], zero, zero, zero, zero, zero, zero,
                  zero, zero))
    st = refresh(jnp.stack(list(cij) + [divv]), (0.0,) * 7)
    cij = tuple(st[i] for i in range(6))
    divv = st[6]

    alpha_out = pve.av_switches(base, c, kx, xm, divv, vx, vy, vz, cij,
                                alpha, dt, gate=gate(prev["alpha"]))
    alpha_new = jnp.where(validint, alpha_out, alpha)
    alpha_new = refresh(alpha_new[None], (0.0,))[0]

    ax, ay, az, du, mvs = pve.momentum(
        base, vx, vy, vz, c, prho, rho, xm, alpha_new, m, cij,
        gate=gate(prev["ax"], prev["ay"], prev["az"], prev["du"], zero))
    return dict(h=h_new, nc_sph=nc_sph, xm=xm, kx=kx, gradh=gradh, c=c,
                prho=prho, rho=rho, divv=divv, alpha=alpha_new,
                c11=cij[0], c12=cij[1], c13=cij[2], c22=cij[3],
                c23=cij[4], c33=cij[5],
                ax=ax, ay=ay, az=az, du=du, maxvsignal=mvs)
