"""VE propagator on the Pallas cell-major fast path (single chip).

Two entry points:

  - make_ve_step_pallas: particle-frame step, layout rebuilt per call —
    same in/out contract as propagator/ve.py (used by the CLI and the
    Pallas-vs-XLA equivalence tests).
  - ResidentVE: the production TPU engine. The whole simulation state
    lives in the cell-major slot frame between steps, so the per-step
    argsort + field materialization of round 1 disappears; a drift
    margin tracked in-graph triggers a (lax.cond) layout rebin only
    when 2*(h_max + accumulated drift) approaches the cell edge. The
    periodic fold is deferred to rebin time (ghost images carry the
    shifts), which keeps binned and true positions consistent.

Step choreography (per-stage ghost refreshes at exactly the reference's
exchangeHalos points, ve_hydro.hpp:132-205): xmass+h-iter -> [xm, h] ->
gradh -> [kx, gradh] -> EOS (elementwise, ghost-correct by construction)
-> IAD/divv -> [cij, divv(, gradv)] -> AV -> [alpha] -> momentum+energy
-> integrate -> [positions, velocities, ...].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from sphexa_tpu.config import SphConfig
from sphexa_tpu.ops.cellmajor import (CMGrid, build_layout, from_cm,
                                      interior_mask, positions_cm, to_cm)
from sphexa_tpu.ops.pallas_ve import FILL_POS, PallasVE, make_ghost_refresh
from sphexa_tpu.sfc.box import Box, put_in_box
from sphexa_tpu.sph import timestep as ts
from sphexa_tpu.sph.eos import eos_ve, ideal_gas_cv
from sphexa_tpu.sph.kernels import update_h
from sphexa_tpu.sph.positions import position_update, temp_update
from sphexa_tpu.state import Particles, SimState
from sphexa_tpu.util.kahan import kahan_sum


class _Refreshers:
    """Ghost-refresh pallas calls, cached per row-stack width."""

    def __init__(self, grid: CMGrid, box: Box, interpret: bool):
        self._grid = grid
        self._box = box
        self._interpret = interpret
        self._cache = {}

    def __call__(self, nrows: int, xyz_rows=None):
        key = (nrows, xyz_rows)
        if key not in self._cache:
            self._cache[key] = make_ghost_refresh(
                self._grid, self._box, nrows, xyz_rows=xyz_rows,
                interpret=self._interpret)
        return self._cache[key]


def _run_pipeline(pve: PallasVE, refresh, base, m, vx, vy, vz,
                  temp, alpha, dt, validint):
    """The five pair stages with ghost refreshes between them. base[3]
    (h) is replaced by the xmass-stage adapted h. `refresh(stack,
    fills)` maps a [k, n_slots] row stack to the same stack with all
    ghost slots re-derived (single chip: the pallas ghost kernel; multi
    chip: that plus the ppermute z-plane/band exchange); `fills` gives
    each row's benign invalid-slot value — the frame contract requires
    every slot the pair kernels might read to stream finite,
    divide-safe data, and slots of never-computed cells (empty / ghost
    on a local window) otherwise carry unwritten kernel output memory.
    Returns a dict of cm frame results."""
    cfg = pve.cfg

    xm, h_new, nc, nonconv = pve.xmass_h(base, m)
    h_new = jnp.where(validint, h_new, base[3])
    st = refresh(jnp.stack([xm, h_new]), (1.0, 1.0))
    xm, h_new = st[0], st[1]
    base = [base[0], base[1], base[2], h_new, base[4]]
    nc_sph = nc + 1.0

    kx, gradh = pve.gradh(base, m, xm)
    st = refresh(jnp.stack([kx, gradh]), (1.0, 1.0))
    kx, gradh = st[0], st[1]

    # EOS is elementwise on ghost-correct rows, so its outputs are
    # ghost-correct without another refresh (hydro_ve/eos.hpp:67-76).
    # Frame contract: invalid slots (FILL_POS positions) must stream
    # finite, divide-safe rho/prho into the momentum kernel, whose
    # accumulations are fold-into-fma (no NaN-protecting selects).
    rho, p, c, prho = eos_ve(temp, m, kx, xm, gradh, cfg.mui, cfg.gamma)
    va = base[0] < 0.5 * FILL_POS
    rho = jnp.where(va, rho, 1.0)
    c = jnp.where(va, c, 1.0)
    prho = jnp.where(va, prho, 0.0)

    cij, divv, curlv, gradv = pve.iad_divv(base, kx, xm, vx, vy, vz)
    if cfg.av_clean:
        st = refresh(jnp.stack(list(cij) + [divv, curlv] + list(gradv)),
                     (0.0,) * 14)
        gradv = tuple(st[8 + i] for i in range(6))
    else:
        st = refresh(jnp.stack(list(cij) + [divv, curlv]), (0.0,) * 8)
    cij = tuple(st[i] for i in range(6))
    divv, curlv = st[6], st[7]

    alpha_out = pve.av_switches(base, c, kx, xm, divv, vx, vy, vz, cij,
                                alpha, dt)
    alpha_new = jnp.where(validint, alpha_out, alpha)
    # refresh as an 8-row stack: a [1, n_slots] array takes a T(1,128)
    # layout whose copies run ~40x slower than T(8,128) (measured 39 ms
    # on the v5e); padding with dead rows is far cheaper
    pad7 = [jnp.zeros_like(alpha_new)] * 7
    alpha_new = refresh(jnp.stack([alpha_new] + pad7), (0.0,) * 8)[0]

    mom_kw = {}
    if cfg.av_clean:
        eta_crit = jnp.cbrt(32.0 * jnp.pi / 3.0 / jnp.maximum(nc_sph, 1.0))
        mom_kw = dict(gradv=gradv, eta_crit_cm=eta_crit)
    ax, ay, az, du, mvs = pve.momentum(base, vx, vy, vz, c, prho, rho, xm,
                                       alpha_new, m, cij, **mom_kw)
    return dict(h=h_new, nc_sph=nc_sph, xm=xm, kx=kx, rho=rho, p=p, c=c,
                prho=prho, divv=divv, curlv=curlv, alpha=alpha_new,
                ax=ax, ay=ay, az=az, du=du, maxvsignal=mvs,
                h_nonconv=nonconv)


def _add_gravity(out, x, y, z, m, alive, box: Box, cfg: SphConfig):
    """Couple self-gravity into the force step (reference:
    ve_hydro.hpp:195-204). Solver choice mirrors propagator/ve.py; the
    arrays may be particle-frame or cell-major slot rows — every solver
    takes (positions, m, alive)."""
    if cfg.gravG == 0.0:
        return out, 0.0, 0
    from sphexa_tpu.gravity.direct import egrav as _eg
    if cfg.gravity_solver == "fmm":
        from sphexa_tpu.gravity.fmm import FmmConfig, fmm_gravity
        g = fmm_gravity(x, y, z, m, alive, box, cfg.gravG,
                        FmmConfig(level=cfg.fmm_level,
                                  min_sep=cfg.fmm_min_sep), eps=cfg.eps)
    elif cfg.gravity_solver == "ewald":
        from sphexa_tpu.gravity.ewald import ewald_gravity
        g = ewald_gravity(x, y, z, m, alive, box, cfg.gravG, eps=cfg.eps)
    else:
        from sphexa_tpu.gravity.direct import direct_gravity
        g = direct_gravity(x, y, z, m, alive, cfg.gravG, cfg.eps)
    out = dict(out, ax=out["ax"] + g.ax, ay=out["ay"] + g.ay,
               az=out["az"] + g.az)
    return out, _eg(m, g.pot, alive), getattr(g, "nf_truncated", 0)


# --------------------------------------------------------------------------
# particle-frame compatibility step (layout rebuilt per call)
# --------------------------------------------------------------------------

def make_ve_step_pallas(box: Box, grid: CMGrid, cfg: SphConfig,
                        interpret: bool = False):
    from sphexa_tpu.propagator.common import finish_step

    pve = PallasVE(grid, cfg, interpret=interpret)
    rf = _Refreshers(grid, box, interpret)
    intmask = interior_mask(grid)

    @jax.jit
    def step(state):
        ps = state.p
        n = ps.n
        layout = build_layout(grid, box, ps.x, ps.y, ps.z, alive=ps.alive)
        base = pve.base_rows(layout, ps.x, ps.y, ps.z, ps.h)
        cm = lambda f, fill=0.0: to_cm(layout, f, fill)
        validint = layout.valid & intmask

        refresh = lambda st, fills=None: rf(st.shape[0])(st)
        out = _run_pipeline(pve, refresh, base, cm(ps.m), cm(ps.vx),
                            cm(ps.vy), cm(ps.vz), cm(ps.temp), cm(ps.alpha),
                            state.dt, validint)
        out, egrav, nf_trunc = _add_gravity(out, base[0], base[1], base[2],
                                            cm(ps.m), validint, box, cfg)

        back = lambda f, fill=0.0: from_cm(layout, f, n, fill)
        ps = ps.replace(h=back(out["h"], 1.0),
                        alpha=back(out["alpha"], cfg.alphamin))
        max_nc = jnp.max(jnp.where(validint, out["nc_sph"] - 1.0, 0.0))
        new_state, diag = finish_step(
            state, ps, back(out["ax"]), back(out["ay"]), back(out["az"]),
            back(out["du"]), back(out["maxvsignal"]), back(out["c"], 1.0),
            back(out["divv"]), back(out["nc_sph"], 1.0), box, cfg,
            max_nc=max_nc.astype(jnp.int32),
            max_cell_count=layout.overflow.astype(jnp.int32),
            egrav=egrav, nf_truncated=nf_trunc,
            rho=back(out["rho"], 1.0), p=back(out["p"]))
        return new_state, diag

    return step


# --------------------------------------------------------------------------
# resident engine
# --------------------------------------------------------------------------

_RVROWS = ("x", "y", "z", "h", "m", "vx", "vy", "vz", "temp", "alpha",
           "du_m1", "x_m1", "y_m1", "z_m1")


@struct.dataclass
class RVState:
    """Simulation state resident in the cell-major slot frame."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    h: jnp.ndarray
    m: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    temp: jnp.ndarray
    alpha: jnp.ndarray
    du_m1: jnp.ndarray
    x_m1: jnp.ndarray
    y_m1: jnp.ndarray
    z_m1: jnp.ndarray
    gid: jnp.ndarray       # f32 original particle id; -1 on invalid slots
    valid: jnp.ndarray     # bool slot occupancy (static between rebins)
    drift: jnp.ndarray     # accumulated max displacement since rebin
    overflow: jnp.ndarray  # sticky rebin slot-overflow count (must stay 0)
    ttot: jnp.ndarray
    dt: jnp.ndarray
    dt_m1: jnp.ndarray
    iteration: jnp.ndarray


class ResidentDiag(NamedTuple):
    dt: jnp.ndarray
    ttot: jnp.ndarray
    etot: jnp.ndarray
    ecin: jnp.ndarray
    eint: jnp.ndarray
    h_max: jnp.ndarray
    nc_mean: jnp.ndarray
    max_nc: jnp.ndarray
    overflow: jnp.ndarray
    maxvsignal: jnp.ndarray
    drift: jnp.ndarray
    rebinned: jnp.ndarray
    need_regrid: jnp.ndarray
    h_nonconv: jnp.ndarray   # particles whose h controller hit h_iter
                             # without converging (reference iterates to
                             # convergence, find_neighbors.hpp:48)
    nf_truncated: jnp.ndarray = 0   # FMM near-field slots beyond leaf_cap
                                    # (dropped pairs — fail-stop signal)
    n_hclamped: jnp.ndarray = 0     # particles riding the SphConfig.h_cap
                                    # roof (0 when the clamp is off)


class ResidentVE:
    """Cell-major-resident VE stepper: jit once, step with no host work.

    The layout rebin is a lax.cond branch taken when the in-graph drift
    margin is exhausted: 2*(h_max + drift) >= rebin_frac * cell_edge
    guarantees every true neighbor pair stays inside the 27-stencil of
    its (stale) binned cells — the single-chip analog of the reference
    Domain::sync cadence (domain.hpp:196)."""

    REBIN_FRAC = 0.95

    def __init__(self, box: Box, grid: CMGrid, cfg: SphConfig,
                 interpret: bool = False):
        self.box = box
        self.grid = grid
        self.cfg = cfg
        self.pve = PallasVE(grid, cfg, interpret=interpret)
        self.rf = _Refreshers(grid, box, interpret)
        self.intmask = interior_mask(grid)
        self.cell_edge = min(box.lx / grid.nx, box.ly / grid.n,
                             box.lz / grid.nz)
        self.step = jax.jit(self._step, donate_argnums=0)
        self._steps_cache = {}

    def steps(self, rst: RVState, k: int):
        """Run k steps inside ONE jit dispatch (lax.scan). Through the
        tunneled device each dispatch costs ~100 ms of launch gap on
        top of ~320 ms of device work at Sedov 100^3, so chaining steps
        in-graph is a ~30% throughput win on the real rig. Returns
        (state, stacked diags)."""
        if k not in self._steps_cache:
            def body(r, _):
                r, d = self._step(r)
                return r, d

            self._steps_cache[k] = jax.jit(
                lambda r: jax.lax.scan(body, r, None, length=k),
                donate_argnums=0)
        return self._steps_cache[k](rst)

    # ---- frame conversion ------------------------------------------------
    def _gather(self, layout, fields: dict, scalars: dict,
                gid_src) -> RVState:
        xs, ys, zs = positions_cm(layout, fields["x"], fields["y"],
                                  fields["z"])
        fillv = jnp.where(layout.valid, 0.0, FILL_POS)
        rows = {"x": xs + fillv, "y": ys + fillv, "z": zs + fillv}
        rows["h"] = to_cm(layout, fields["h"], fill=1.0)
        for f in _RVROWS[4:]:
            rows[f] = to_cm(layout, fields[f])
        gid = to_cm(layout, gid_src, fill=-1.0)
        return RVState(gid=gid, valid=layout.valid, **rows, **scalars)

    def bind(self, state: SimState) -> RVState:
        ps = state.p
        layout = build_layout(self.grid, self.box, ps.x, ps.y, ps.z,
                              alive=ps.alive)
        fields = {f: getattr(ps, f) for f in _RVROWS}
        gid_src = jnp.arange(ps.n, dtype=jnp.float32)
        # jnp.copy: the scalar buffers must NOT alias the SimState's —
        # steps() donates the bound frame, and aliased scalars would
        # delete the caller's state (observed when bench binds the same
        # evolved state into two engines)
        scalars = dict(drift=jnp.float32(0.0),
                       overflow=layout.overflow.astype(jnp.int32),
                       ttot=jnp.copy(state.ttot), dt=jnp.copy(state.dt),
                       dt_m1=jnp.copy(state.dt_m1),
                       iteration=jnp.copy(state.iteration))
        return self._gather(layout, fields, scalars, gid_src)

    def _rebin(self, rst: RVState) -> RVState:
        x, y, z = put_in_box(self.box, rst.x, rst.y, rst.z)
        alive = rst.valid & self.intmask
        layout = build_layout(self.grid, self.box, x, y, z, alive=alive)
        fields = {f: getattr(rst, f) for f in _RVROWS}
        fields.update(x=x, y=y, z=z)
        scalars = dict(
            drift=jnp.float32(0.0),
            overflow=rst.overflow + layout.overflow.astype(jnp.int32),
            ttot=rst.ttot, dt=rst.dt, dt_m1=rst.dt_m1,
            iteration=rst.iteration)
        return self._gather(layout, fields, scalars, rst.gid)

    def unbind(self, rst: RVState, n_capacity: int) -> SimState:
        validint = rst.valid & self.intmask
        idx = jnp.where(validint, rst.gid, float(n_capacity)).astype(
            jnp.int32)
        x, y, z = put_in_box(self.box, rst.x, rst.y, rst.z)
        pos = {"x": x, "y": y, "z": z}

        def back(row, fill=0.0):
            out = jnp.full((n_capacity,), fill, row.dtype)
            return out.at[idx].set(jnp.where(validint, row, fill),
                                   mode="drop")

        fields = {f: back(pos.get(f, getattr(rst, f))) for f in _RVROWS}
        alive = jnp.zeros((n_capacity,), bool).at[idx].set(
            validint, mode="drop")
        ps = Particles(alive=alive, **fields)
        # jnp.copy: the scalars must NOT alias the resident frame's
        # buffers — steps() donates the frame, and an aliased ttot makes
        # a snapshot taken before stepping unreadable afterwards
        # (observed: sedov_gate overflow-retry crash, queue 2026-08-19)
        return SimState(p=ps, ttot=jnp.copy(rst.ttot), dt=jnp.copy(rst.dt),
                        dt_m1=jnp.copy(rst.dt_m1),
                        iteration=jnp.copy(rst.iteration))

    # ---- the step ----------------------------------------------------------
    def _step(self, rst: RVState):
        cfg = self.cfg
        box = self.box
        validint = rst.valid & self.intmask

        h_max0 = jnp.max(jnp.where(validint, rst.h, 0.0))
        stale = (2.0 * (h_max0 + rst.drift)
                 >= self.REBIN_FRAC * self.cell_edge)
        rst = jax.lax.cond(stale, self._rebin, lambda r: r, rst)
        validint = rst.valid & self.intmask

        base = [rst.x, rst.y, rst.z, rst.h, rst.gid]
        refresh = lambda st, fills=None: self.rf(st.shape[0])(st)
        out = _run_pipeline(self.pve, refresh, base, rst.m, rst.vx, rst.vy,
                            rst.vz, rst.temp, rst.alpha, rst.dt, validint)
        out, egrav, nf_trunc = _add_gravity(out, rst.x, rst.y, rst.z, rst.m,
                                            validint, box, cfg)

        # ---- global timestep (ts_global.hpp:96-112) ----
        dt_courant = ts.courant_timestep(out["maxvsignal"], out["h"],
                                         out["c"], validint, cfg.kcour)
        candidates = [dt_courant,
                      ts.rho_timestep(out["divv"], validint, cfg.krho)]
        if cfg.gravG != 0.0:
            candidates.append(ts.acceleration_timestep(
                out["ax"], out["ay"], out["az"], validint, cfg.eta_acc,
                cfg.eps))
        dt = ts.combine_timesteps(rst.dt, jnp.stack(candidates), cfg)
        dt_m1 = rst.dt

        # ---- integration, unfolded (fold happens at rebin) ----
        x, y, z, vx, vy, vz, dx, dy, dz = position_update(
            dt, dt_m1, rst.x, rst.y, rst.z, out["ax"], out["ay"], out["az"],
            rst.x_m1, rst.y_m1, rst.z_m1, box,
            h=out["h"], vx=rst.vx, vy=rst.vy, vz=rst.vz, fold=False)
        temp = temp_update(rst.temp, dt, dt_m1, out["du"], rst.du_m1,
                           cfg.mui, cfg.gamma)
        h = update_h(cfg.ng0, out["nc_sph"], out["h"], h_cap=cfg.h_cap)
        h = jnp.where(validint, h, rst.h)

        disp2 = dx * dx + dy * dy + dz * dz
        step_disp = jnp.sqrt(jnp.max(jnp.where(validint, disp2, 0.0)))
        drift = rst.drift + step_disp

        st = self.rf(12, xyz_rows=(0, 1, 2))(jnp.stack(
            [x, y, z, h, vx, vy, vz, temp, out["du"], dx, dy, dz]))
        rst = rst.replace(
            x=st[0], y=st[1], z=st[2], h=st[3], vx=st[4], vy=st[5],
            vz=st[6], temp=st[7], du_m1=st[8], x_m1=st[9], y_m1=st[10],
            z_m1=st[11], alpha=out["alpha"], drift=drift,
            ttot=rst.ttot + dt, dt=dt, dt_m1=dt_m1,
            iteration=rst.iteration + 1)

        # ---- diagnostics ----
        cv = ideal_gas_cv(cfg.mui, cfg.gamma)
        ecin = 0.5 * kahan_sum(jnp.where(
            validint, rst.m * (rst.vx ** 2 + rst.vy ** 2 + rst.vz ** 2),
            0.0))
        eint = kahan_sum(jnp.where(validint, rst.m * cv * rst.temp, 0.0))
        nvalid = jnp.maximum(jnp.sum(validint), 1)
        h_max = jnp.max(jnp.where(validint, rst.h, 0.0))
        diag = ResidentDiag(
            dt=dt, ttot=rst.ttot, etot=ecin + eint + egrav, ecin=ecin,
            eint=eint,
            h_max=h_max,
            nc_mean=(jnp.sum(jnp.where(validint, out["nc_sph"], 0.0))
                     / nvalid).astype(jnp.float32),
            max_nc=jnp.max(jnp.where(validint, out["nc_sph"] - 1.0,
                                     0.0)).astype(jnp.int32),
            overflow=rst.overflow,
            maxvsignal=jnp.max(jnp.where(validint, out["maxvsignal"], 0.0)),
            drift=drift, rebinned=stale,
            need_regrid=(2.0 * h_max * 1.05 >= self.cell_edge),
            h_nonconv=jnp.sum(jnp.where(validint, out["h_nonconv"],
                                        0.0)).astype(jnp.int32),
            nf_truncated=jnp.int32(nf_trunc),
            n_hclamped=(jnp.sum(jnp.where(
                validint & (rst.h >= 0.999 * cfg.h_cap), 1, 0)).astype(
                    jnp.int32) if cfg.h_cap > 0.0 else jnp.int32(0)))
        return rst, diag
