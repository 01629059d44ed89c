"""Block time-steps composed with the slab-sharded Pallas engine —
the multi-chip HydroVeBdtProp (reference:
main/src/propagator/ve_hydro_bdt.hpp:171-212, which runs rungs on the
full distributed domain: `sync()` at cycle starts, `partialSync()`
halo refreshes inside the cycle).

Composition (VERDICT r3 item 1/3 — the levers were mutually exclusive
engines until now):

  - cycle start: full domain sync — unpack the resident cell-major
    frame to the particle frame, slab `migrate` (with the per-slot
    kick-interval dt_m1k riding as migration payload), rebuild the
    local layout, rebind. This is the reference's sync() cadence.
  - substeps: the single-chip gated substep (ve_bdt.BdtVE._substep)
    verbatim, with two swaps wired through class hooks:
      refresh  -> z-plane ppermute (partialSync analog) composed with
                  the local xy ghost kernel, exactly the
                  ve_pallas_sharded exchange;
      reductions -> pmin/pmax/psum over the mesh axis (the
                  MPI_Allreduce points of rungTimestep/minDt).
    Rung harmonization stays a LOCAL per-cell min — cells are global
    grid cells, each owned by exactly one rank, so no collective is
    needed there (same as the reference's per-group rung reduction).

Self-gravity composes into the substep: the `_gravity` hook runs the
hierarchical cross-rank FMM (psum'd moment grid + near-field bands)
on the resident rows each substep — the distributed analog of the
reference recomputing gravity per rung step
(ve_hydro_bdt.hpp:277-288).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sphexa_tpu.config import INDEX_DTYPE, SphConfig
from sphexa_tpu.domain.slab import AXIS, SlabConfig, _pack, migrate
from sphexa_tpu.ops.cellmajor import CMGrid, build_layout
from sphexa_tpu.ops.pallas_ve import FILL_POS, make_ghost_refresh
from sphexa_tpu.propagator.ve_bdt import BDTState, BdtVE
from sphexa_tpu.propagator.ve_pallas_sharded import _zplane_maps
from sphexa_tpu.sfc.box import Box, Boundary, put_in_box
from sphexa_tpu.state import Particles, SimState, _FIELDS


def make_zxchg(grid: CMGrid, box: Box, D: int):
    """z-ghost-plane exchange: fill each device's ghost planes from the
    neighbors' interior edge planes (one ppermute each way) — identical
    semantics to ve_pallas_sharded's closure, factored for reuse."""
    zmaps = _zplane_maps(grid)
    periodic_z = box.bz == Boundary.periodic

    def zxchg(stack, zrow: int = -1):
        me = jax.lax.axis_index(AXIS)

        def shift_ring(x, direction):
            perm = [(i, (i + direction) % D) for i in range(D)]
            return jax.lax.ppermute(x, AXIS, perm)

        from_left = shift_ring(stack[:, zmaps["hi_edge"]], +1)
        from_right = shift_ring(stack[:, zmaps["lo_edge"]], -1)
        if zrow >= 0 and periodic_z:
            sl = jnp.where(me == 0, -box.lz, 0.0).astype(jnp.float32)
            sr = jnp.where(me == D - 1, box.lz, 0.0).astype(jnp.float32)
            from_left = from_left.at[zrow].add(sl)
            from_right = from_right.at[zrow].add(sr)
        if not periodic_z:
            kill_l = (me == 0)
            kill_r = (me == D - 1)
            # open z: outermost devices hold no images. Position stacks
            # are invalidated with FILL_POS; everything else gets 1.0 —
            # NOT 0.0: the pair kernels' frame contract requires finite
            # DIVIDE-SAFE j rows (volj = xm_j / kx_j in the IAD kernel
            # is 0/0 = NaN on zero fills, and w=0 cannot mask a NaN)
            kill_val = FILL_POS if zrow >= 0 else 1.0
            from_left = jnp.where(kill_l, kill_val, from_left)
            from_right = jnp.where(kill_r, kill_val, from_right)
        stack = stack.at[:, zmaps["lo_ghost"]].set(from_left)
        stack = stack.at[:, zmaps["hi_ghost"]].set(from_right)
        return stack

    return zxchg


class _ShardedRefreshers:
    """Drop-in for ve_pallas._Refreshers inside shard_map: z planes via
    ppermute, then the local xy ghost kernel (corners compose)."""

    def __init__(self, grid: CMGrid, box: Box, D: int, interpret: bool):
        self._grid = grid
        self._box_loc = dataclasses.replace(box, bz=Boundary.open)
        self._interpret = interpret
        self._zxchg = make_zxchg(grid, box, D)
        self._cache = {}

    def __call__(self, nrows: int, xyz_rows=None):
        key = (nrows, xyz_rows)
        if key not in self._cache:
            rfk = make_ghost_refresh(self._grid, self._box_loc, nrows,
                                     xyz_rows=xyz_rows,
                                     interpret=self._interpret,
                                     refresh_z=False)
            zrow = xyz_rows[2] if xyz_rows is not None else -1
            zx = self._zxchg
            self._cache[key] = lambda stack: rfk(zx(stack, zrow=zrow))
        return self._cache[key]


class ShardedBdtVE(BdtVE):
    """Slab-sharded resident BDT engine. `grid` is the per-device local
    grid (n x n x nz_local); the global grid is n x n x (nz_local * D),
    plane-aligned with the migration slabs."""

    def __init__(self, box: Box, grid: CMGrid, cfg: SphConfig,
                 sc: SlabConfig, mesh: Mesh, num_rungs: int = 4,
                 interpret: bool = False):
        super().__init__(box, grid, cfg, num_rungs=num_rungs,
                         interpret=interpret)
        self.sc = sc
        self.mesh = mesh
        D = sc.n_slabs
        self.D = D
        self.W = box.lz / D
        # sharded exchange replaces the single-chip ghost kernel
        self.rf = _ShardedRefreshers(grid, box, D, interpret)
        self._substep_sharded = None
        self._resync_sharded = None
        self._unpack_sharded = None
        self.substep = self._substep_dispatch

    # ---- collective hooks (MPI_Allreduce points) -----------------------
    def _gmin(self, v):
        return jax.lax.pmin(v, AXIS)

    def _gmax(self, v):
        return jax.lax.pmax(v, AXIS)

    def _gsum(self, v):
        return jax.lax.psum(v, AXIS)

    def _gravity(self, out, x, y, z, m, valid):
        """Distributed per-substep self-gravity: the hierarchical
        cross-rank solver over the slab mesh (syncGrav composition of
        the reference production propagator, ve_hydro_bdt.hpp:171 +
        277-288). The solver bins by global position, so it accepts
        the resident cm-frame slot rows directly (ghost z-planes are
        masked out by `valid`); rows that drifted slightly past the
        slab boundary between resyncs still land in the correct global
        moment-grid cell, and the near-field ring margin covers them —
        the ring-coverage counter fail-stops if it ever doesn't."""
        import types

        from sphexa_tpu.propagator.ve_sharded import _sharded_gravity
        ps = types.SimpleNamespace(x=x, y=y, z=z, m=m, alive=valid)
        gax, gay, gaz, egrav, govf = _sharded_gravity(
            ps, self.box, self.cfg, AXIS, dim=2)
        out = dict(out, ax=out["ax"] + gax, ay=out["ay"] + gay,
                   az=out["az"] + gaz)
        return out, egrav, govf

    # ---- frame plumbing (all run inside shard_map) ---------------------
    def _bind_local(self, ps: Particles, gid, dt_m1k, scalars: dict,
                    overflow0) -> BDTState:
        """Local layout build + cm gather; the sharded analog of
        ResidentVE.bind + BdtVE.bind_bdt."""
        me = jax.lax.axis_index(AXIS)
        z_lo = self.box.zmin + self.W * me.astype(jnp.float32)
        z_fake = (ps.z - z_lo) * float(self.D) + self.box.zmin
        z_fake = jnp.clip(z_fake, self.box.zmin,
                          self.box.zmax - 1e-6 * self.box.lz)
        box_loc = dataclasses.replace(self.box, bz=Boundary.open)
        layout = build_layout(self.grid, box_loc, ps.x, ps.y, z_fake,
                              alive=ps.alive)
        fields = {f: getattr(ps, f) for f in
                  ("x", "y", "z", "h", "m", "vx", "vy", "vz", "temp",
                   "alpha", "du_m1", "x_m1", "y_m1", "z_m1")}
        sc_scalars = dict(
            drift=jnp.float32(0.0),
            overflow=overflow0 + self._gsum(
                layout.overflow.astype(jnp.int32)),
            ttot=scalars["ttot"], dt=scalars["dt"],
            dt_m1=scalars["dt_m1"], iteration=scalars["iteration"])
        rv = self._gather(layout, fields, sc_scalars, gid)

        # z-ghost planes are empty after a local bind (open-z layout):
        # refresh every row the pair kernels read as j-inputs
        st = self.rf(15, xyz_rows=(0, 1, 2))(jnp.stack(
            [rv.x, rv.y, rv.z, rv.h, rv.gid, rv.m, rv.vx, rv.vy, rv.vz,
             rv.temp, rv.alpha, rv.du_m1, rv.x_m1, rv.y_m1, rv.z_m1]))
        rv = rv.replace(x=st[0], y=st[1], z=st[2], h=st[3], gid=st[4],
                        m=st[5], vx=st[6], vy=st[7], vz=st[8], temp=st[9],
                        alpha=st[10], du_m1=st[11], x_m1=st[12],
                        y_m1=st[13], z_m1=st[14])

        from sphexa_tpu.ops.cellmajor import to_cm
        dt_m1k_cm = to_cm(layout, dt_m1k, fill=1.0)
        zero = jnp.zeros_like(rv.x)
        one = jnp.ones_like(rv.x)
        return BDTState(
            rv=rv, xk=rv.x, yk=rv.y, zk=rv.z, tempk=rv.temp,
            dxk=rv.x_m1, dyk=rv.y_m1, dzk=rv.z_m1,
            axk=zero, ayk=zero, azk=zero, duk=zero, du_m1k=rv.du_m1,
            dt_m1k=jnp.where(rv.valid, dt_m1k_cm, 1.0),
            rung=zero, ticks=zero,
            xm=one, kx=one, gradh=one, c11=zero, c12=zero, c13=zero,
            c22=zero, c23=zero, c33=zero, divv=zero,
            dt_min=scalars["dt"], substep=jnp.int32(0))

    def _unpack_local(self, bst: BDTState):
        """Resident frame -> local particle frame [cap] (+ gid, dt_m1k
        payload). Call at cycle boundaries only (every slot at its kick
        point, so kick state == current state)."""
        rv = bst.rv
        validint = rv.valid & self.intmask
        x, y, z = put_in_box(self.box, rv.x, rv.y, rv.z)
        pos = {"x": x, "y": y, "z": z}
        cols = [pos.get(f, getattr(rv, f)) for f in _FIELDS[:-1]]
        cols += [rv.gid, bst.dt_m1k]
        packed, n_own = _pack(validint, cols, self.sc.cap)
        lost_pack = self._gsum(
            jnp.sum(validint.astype(jnp.int32)) - n_own)
        alive = jnp.arange(self.sc.cap, dtype=INDEX_DTYPE) < n_own
        ps = Particles(alive=alive,
                       **dict(zip(_FIELDS[:-1], packed[:len(_FIELDS) - 1])))
        ps = ps.replace(h=jnp.where(alive, ps.h, 1.0))
        return ps, packed[-2], packed[-1], lost_pack

    def _resync_local(self, bst: BDTState):
        """Cycle-start full sync: unpack -> migrate -> rebind (the
        reference sync(), ve_hydro_bdt.hpp:178). Returns the rebound
        state and a psum'd lost counter (must stay 0)."""
        ps, gid, dt_m1k, lost_pack = self._unpack_local(bst)
        ps, (gid, dt_m1k), lost_mig = migrate(ps, self.box, self.sc,
                                              extras=(gid, dt_m1k))
        rv = bst.rv
        scalars = dict(ttot=rv.ttot, dt=rv.dt, dt_m1=rv.dt_m1,
                       iteration=rv.iteration)
        new = self._bind_local(ps, gid, dt_m1k, scalars, rv.overflow)
        new = new.replace(dt_min=bst.dt_min)
        return new, lost_pack + self._gsum(lost_mig)

    # ---- sharded entry points ------------------------------------------
    def _specs(self, tree):
        return jax.tree.map(
            lambda a: P(AXIS) if getattr(a, "ndim", 0) >= 1 else P(), tree)

    def _substep_dispatch(self, bst: BDTState, phases_real=None,
                          phases_imag=None):
        stirred = phases_real is not None
        if self._substep_sharded is None:
            self._substep_sharded = {}
        if stirred not in self._substep_sharded:
            from sphexa_tpu.propagator.ve_bdt import BDTDiag
            spec = self._specs(bst)
            # every diag entry is pmin/pmax/psum-reduced -> replicated
            dspec = BDTDiag(*[P()] * len(BDTDiag._fields))
            # OU mode phases are global state, replicated on every rank
            in_specs = (spec, P(), P()) if stirred else (spec,)
            fn = jax.shard_map(super()._substep, mesh=self.mesh,
                               in_specs=in_specs, out_specs=(spec, dspec),
                               check_vma=False)
            self._substep_sharded[stirred] = jax.jit(fn)
        if stirred:
            return self._substep_sharded[True](bst, phases_real,
                                               phases_imag)
        return self._substep_sharded[False](bst)

    def resync(self, bst: BDTState):
        if self._resync_sharded is None:
            spec = self._specs(bst)
            fn = jax.shard_map(self._resync_local, mesh=self.mesh,
                               in_specs=(spec,), out_specs=(spec, P()),
                               check_vma=False)
            self._resync_sharded = jax.jit(fn)
        return self._resync_sharded(bst)

    def run_cycle(self, bst: BDTState):
        """Full sync, then one rung hierarchy (2^(numRungs-1) substeps).
        Fail-stops on any migration/pack loss."""
        bst, lost = self.resync(bst)
        if int(lost) != 0:
            raise RuntimeError(f"sharded BDT sync lost {int(lost)} rows")
        diags = []
        for _ in range(1 << (self.num_rungs - 1)):
            bst, d = self.substep(bst)
            diags.append(d)
        if any(int(d.overflow) != 0 for d in diags):
            raise RuntimeError(
                "sharded BDT slot overflow / gravity band fail-stop")
        return bst, diags

    # ---- host-side binding / gathering ----------------------------------
    def distribute_bind(self, state: SimState) -> BDTState:
        """Initial host->device distribution + bind. state.p may be any
        padded single-frame Particles; alive rows are distributed into
        z-slabs and bound into per-rank resident frames."""
        from sphexa_tpu.propagator.ve_sharded import distribute

        alive = np.asarray(state.p.alive)
        host = {f: np.asarray(getattr(state.p, f))[alive]
                for f in _FIELDS[:-1]}
        self.n_capacity = len(host["x"])
        gid_h = np.arange(self.n_capacity, dtype=np.float32)
        dtm1_h = np.full(self.n_capacity, float(state.dt_m1), np.float32)
        ps, extras = distribute(host, self.box, self.sc, self.mesh,
                                extras={"gid": gid_h, "dt_m1k": dtm1_h})
        scalars = dict(ttot=state.ttot, dt=state.dt, dt_m1=state.dt_m1,
                       iteration=state.iteration)
        spec_ps = Particles(**{f: P(AXIS) for f in _FIELDS})
        fn = jax.shard_map(
            lambda p, g, dk: self._bind_local(p, g, dk, scalars,
                                              jnp.int32(0)),
            mesh=self.mesh,
            in_specs=(spec_ps, P(AXIS), P(AXIS)),
            out_specs=self._specs_bind(),
            check_vma=False)
        return jax.jit(fn)(ps, extras["gid"], extras["dt_m1k"])

    def _specs_bind(self):
        from sphexa_tpu.propagator.ve_pallas import RVState
        arr = {f: P(AXIS) for f in RVState.__dataclass_fields__}
        for s in ("drift", "overflow", "ttot", "dt", "dt_m1", "iteration"):
            arr[s] = P()
        rv = RVState(**arr)
        b = {f: P(AXIS) for f in BDTState.__dataclass_fields__}
        b.update(rv=rv, dt_min=P(), substep=P())
        return BDTState(**b)

    def restore_rungs(self, bst: BDTState, rung_pf, dt_m1k_pf,
                      dt_min: float) -> BDTState:
        """Sharded restart: install checkpointed rung state into a
        freshly distributed BDTState. The particle-frame arrays are
        global (indexed by gid) and ride in replicated; the cell
        re-harmonization runs rank-local inside shard_map (the base
        implementation's _cell_min assumes the single-chip frame)."""
        spec = self._specs(bst)
        base_restore = super().restore_rungs

        def local(b, rung_g, dtm_g):
            return base_restore(b, rung_g, dtm_g, dt_min)

        fn = jax.shard_map(local, mesh=self.mesh,
                           in_specs=(spec, P(), P()), out_specs=spec,
                           check_vma=False)
        return jax.jit(fn)(bst, jnp.asarray(rung_pf, jnp.float32),
                           jnp.asarray(dt_m1k_pf, jnp.float32))

    def run_cycle_stirred(self, bst: BDTState, turb):
        """run_cycle with turbulence stirring: the OU noise advances on
        the host once per substep with the cycle base dt and the
        projected phases enter every rank's substep replicated — the
        full production composition (reference TurbVeBdtProp,
        main/src/propagator/turb_ve.hpp:114-118, under MPI)."""
        bst, lost = self.resync(bst)
        if int(lost) != 0:
            raise RuntimeError(f"sharded BDT sync lost {int(lost)} rows")
        diags = []
        for _ in range(1 << (self.num_rungs - 1)):
            turb.update_noise(float(bst.dt_min))
            pr, pi = turb.projected_phases()
            bst, d = self.substep(bst, jnp.asarray(pr, jnp.float32),
                                  jnp.asarray(pi, jnp.float32))
            diags.append(d)
        if any(int(d.overflow) != 0 for d in diags):
            raise RuntimeError(
                "sharded BDT slot overflow / gravity band fail-stop")
        return bst, diags

    def checkpoint_rungs(self, bst: BDTState, n_capacity: int) -> dict:
        """Particle-frame rung state from the sharded frame (host-side
        gather; the base implementation assumes the single-chip slot
        frame). Call at a cycle boundary like the base."""
        assert int(bst.substep) == 0, \
            "BDT checkpoints only at cycle boundaries (full sync)"
        rv = bst.rv
        im = np.tile(np.asarray(self.intmask),
                     len(np.asarray(rv.valid)) // len(self.intmask))
        validint = np.asarray(rv.valid) & im
        gid = np.asarray(rv.gid)[validint].astype(np.int64)

        def back(row, fill=0.0):
            out = np.full((n_capacity,), fill, np.float32)
            out[gid] = np.asarray(row)[validint]
            return out

        return {"fields": {"bdt_rung": back(bst.rung),
                           "bdt_dt_m1k": back(bst.dt_m1k)},
                "attrs": {"bdt_dt_min": float(bst.dt_min),
                          "bdt_num_rungs": self.num_rungs}}

    def unbind(self, bst: BDTState, n_capacity: int) -> SimState:
        """Gather the sharded resident frame back to a global particle
        frame (output/checkpoint path)."""
        if self._unpack_sharded is None:
            spec = self._specs(bst)
            pspec = Particles(**{f: P(AXIS) for f in _FIELDS})
            fn = jax.shard_map(
                lambda b: self._unpack_local(b)[:3],
                mesh=self.mesh, in_specs=(spec,),
                out_specs=(pspec, P(AXIS), P(AXIS)), check_vma=False)
            self._unpack_sharded = jax.jit(fn)
        ps, gid, _ = self._unpack_sharded(bst)
        # host-side scatter back to original particle order
        alive = np.asarray(ps.alive)
        gid_np = np.asarray(gid)[alive].astype(np.int64)
        fields = {}
        for f in _FIELDS[:-1]:
            col = np.asarray(getattr(ps, f))[alive]
            out = np.zeros(n_capacity, np.float32)
            if f == "h":
                out[:] = 1.0
            out[gid_np] = col
            fields[f] = jnp.asarray(out)
        alive_g = np.zeros(n_capacity, bool)
        alive_g[gid_np] = True
        p = Particles(alive=jnp.asarray(alive_g), **fields)
        rv = bst.rv
        return SimState(p=p, ttot=rv.ttot, dt=rv.dt, dt_m1=rv.dt_m1,
                        iteration=rv.iteration)


class TurbShardedBdtVE(ShardedBdtVE):
    """Turbulence-stirred sharded BDT — the complete production
    composition: domain decomposition x block time-steps x self-gravity
    x turbulence driving, all in one propagator (reference:
    TurbVeBdtProp under MPI, main/src/propagator/turb_ve.hpp:114-118 +
    ve_hydro_bdt.hpp:171-288). The OU mode state is global and tiny
    (~few hundred modes), so it lives on the host and the projected
    phases are broadcast replicated into every rank's substep — the
    analog of the reference updating the stirring phases identically on
    every MPI rank from a shared RNG sequence."""

    def __init__(self, box: Box, grid: CMGrid, cfg: SphConfig,
                 sc: SlabConfig, mesh: Mesh, turb=None, num_rungs: int = 4,
                 interpret: bool = False, verbose: bool = False):
        from sphexa_tpu.physics.turbulence import TurbulenceData
        self.turb = turb or TurbulenceData.create(verbose=verbose)
        self._turb_modes = jnp.asarray(self.turb.modes, jnp.float32)
        self._turb_amps = jnp.asarray(self.turb.amplitudes, jnp.float32)
        self._turb_norm = self.turb.sol_weight_norm
        super().__init__(box, grid, cfg, sc, mesh, num_rungs=num_rungs,
                         interpret=interpret)

    def run_cycle(self, bst: BDTState):
        return self.run_cycle_stirred(bst, self.turb)
