"""Command-line front end (reference: main/src/sphexa/sphexa.cpp:66-194).

    python -m sphexa_tpu.main --init sedov -n 50 -s 100 -w 25 -o dump.h5

Builds the initializer / propagator / writer via factories, then runs
the iteration loop: forces+integrate -> observables -> output triggers.
Restart with --init path.h5[:step].
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _is_output_step(it: int, spec: str) -> bool:
    """Integer specs trigger every N iterations
    (reference: isOutputStep, io/arg_parser.hpp)."""
    try:
        v = int(spec)
    except ValueError:
        return False
    return v > 0 and it % v == 0


def _is_output_time(t1: float, t2: float, spec: str) -> bool:
    """Float specs trigger when a multiple of the interval falls in
    (t1, t2] (reference: isOutputTime)."""
    try:
        int(spec)
        return False
    except ValueError:
        pass
    try:
        f = float(spec)
    except ValueError:
        return False
    import math
    return f > 0 and math.floor(t2 / f) > math.floor(t1 / f + 1e-12)


def parse_args(argv=None):
    p = argparse.ArgumentParser(prog="sphexa-tpu",
                                description="TPU-native SPH simulation")
    p.add_argument("--init", required=True,
                   help="test case name (sedov, noh, ...) or checkpoint "
                        "file.h5[:step] to restart from")
    p.add_argument("-n", type=int, default=50,
                   help="cube side; N = n^3 particles")
    p.add_argument("-s", "--steps", type=int, default=10,
                   help="number of iterations")
    p.add_argument("--sim-time", type=float, default=None,
                   help="stop when simulation time reached")
    p.add_argument("--prop", default="ve",
                   choices=["ve", "std", "ve-pallas", "ve-tiered",
                            "ve-tiered-resident", "ve-tiered-bdt", "ve-bdt",
                            "nbody", "turbulence-ve", "turbulence-ve-bdt",
                            "std-cooling", "ve-hilbert", "ve-pallas-sharded",
                            "ve-bdt-sharded", "ve-tiered-sharded",
                            "turbulence-ve-bdt-sharded",
                            "ve-pallas-tiles"],
                   help="propagator choice (reference: --prop); ve-hilbert, "
                        "ve-pallas-sharded and ve-bdt-sharded run multi-chip "
                        "over ALL attached devices (the mpiexec-equivalent "
                        "paths; for tests set SPHEXA_PLATFORM=cpu "
                        "SPHEXA_NUM_DEVICES=8)")
    p.add_argument("-w", "--output-every", default="0",
                   help="output frequency: integer = every N iterations, "
                        "float = every dt of simulation time (reference "
                        "isOutputStep/isOutputTime, sphexa.cpp:159-162); "
                        "0 = never")
    p.add_argument("--wextra", default="",
                   help="comma list of extra output triggers: integer "
                        "iteration numbers and/or float sim times "
                        "(reference --wextra)")
    p.add_argument("--duration", type=float, default=None,
                   help="wall-clock limit in seconds: stop (and write a "
                        "final output if writing is enabled) once "
                        "exceeded (reference --duration, sphexa.cpp:156)")
    p.add_argument("-o", "--outfile", default="dump.sphexa.h5")
    p.add_argument("--ascii", action="store_true", help="ASCII output")
    p.add_argument("--constants", default="constants.txt",
                   help="per-step observables file")
    p.add_argument("--dt0", type=float, default=None,
                   help="override initial timestep")
    p.add_argument("--split", type=int, default=1,
                   help="upsample a checkpoint restart N-fold along the "
                        "Hilbert curve (FileSplitInit analog)")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="print per-stage timings")
    p.add_argument("-f", "--fields", default="rho,p",
                   help="comma list of DERIVED columns to add to each "
                        "output step beyond the conserved set "
                        "(available: rho, p; reference -f outputFields, "
                        "sphexa.cpp:86)")
    p.add_argument("--glass", default=None,
                   help="pre-relaxed glass template file (HDF5 with "
                        "x/y/z or .npz) used by glass-tiled ICs "
                        "(reference --glass, sphexa.cpp:82); default: "
                        "self-relaxed cached template")
    p.add_argument("--debug-nans", action="store_true",
                   help="abort on the first NaN-producing op with its "
                        "location (jax_debug_nans) — the runtime "
                        "sanitizer analog of the reference's "
                        "-fsanitize CI builds (sanitize.yml)")
    p.add_argument("--viz-every", type=int, default=0,
                   help="render a PNG slice every N iterations (in-situ "
                        "viz hook; 0 = off)")
    return p.parse_args(argv)


def build_sim(args):
    from sphexa_tpu.config import SphConfig
    from sphexa_tpu.init.settings import (apply_settings, load_settings_file,
                                          parse_init_spec)

    cfg = SphConfig()
    extras = {}
    kind, name, extra = parse_init_spec(args.init)
    if kind == "checkpoint":
        from sphexa_tpu.io.hdf5 import load_checkpoint, load_split_checkpoint
        path, step = name, (extra if extra is not None else -1)
        if args.split > 1:
            # upsampled restart (FileSplitInit, file_init.hpp:103)
            state, box, cfg = load_split_checkpoint(path, cfg, args.split,
                                                    step=step)
            return state, box, cfg, extras
        state, box, cfg = load_checkpoint(path, cfg, step=step)
        from sphexa_tpu.io.hdf5 import load_bdt_state, load_turbulence_state
        try:
            ts = load_turbulence_state(path, step)
        except Exception:
            ts = None
        if ts is not None:
            extras["turb"] = ts
        try:
            bs = load_bdt_state(path, step)
        except Exception:
            bs = None
        if bs is not None:
            extras["bdt"] = bs
        return state, box, cfg, extras
    if kind == "ascii":
        # ASCII restart (reference: io/ifile_io_ascii.cpp reader side);
        # column dumps carry no integrator history — see
        # io/ascii.load_ascii_checkpoint
        from sphexa_tpu.io.ascii import load_ascii_checkpoint
        state, box = load_ascii_checkpoint(name, cfg, step=extra,
                                           dt0=args.dt0)
        if box is None:
            raise SystemExit("ASCII dump has no box header; cannot "
                             "restart from a pre-box-format file")
        return state, box, cfg, extras
    if extra:  # 'case:settings.h5' override layering (settings.hpp:42)
        settings = load_settings_file(extra)
        cfg = apply_settings(cfg, settings)
        extras["settings"] = settings
        args.init = name
    extras["case"] = args.init
    if args.init == "evrard-cooling":
        from sphexa_tpu.init.evrard_cooling import init_evrard_cooling
        state, box, cfg, ex = init_evrard_cooling(args.n, cfg, dt0=args.dt0)
        extras.update(ex)
        args.prop = "std-cooling"
    else:
        from sphexa_tpu.init.factory import make_initializer
        init = make_initializer(args.init)
        state, box, cfg = init(args.n, cfg, dt0=args.dt0)
    if "settings" in extras:  # file overrides win over case constants
        cfg = apply_settings(cfg, extras["settings"])
    return state, box, cfg, extras


def _slot_grid(box, cfg, h_max, n, extras, state):
    """(cap, grid) for the slot-frame engines. With a state available,
    the joint scan sizes the cap from the REALIZED max cell count plus
    the loop's fail-stop headroom (extras['cap_headroom'], bumped on
    slot overflow — the bench's proven re-grid policy); without one,
    the occupancy heuristic."""
    from sphexa_tpu.ops.cellmajor import choose_cap_and_grid, choose_cm_grid
    if state is None:
        return choose_cm_grid(box, h_max * 1.25, n)
    alive = np.asarray(state.p.alive)
    headroom = int((extras or {}).get("cap_headroom", 8))
    _, grid = choose_cap_and_grid(
        box, h_max * 1.25, n, np.asarray(state.p.x)[alive],
        np.asarray(state.p.y)[alive], np.asarray(state.p.z)[alive],
        headroom=headroom)
    return grid


def make_stepper(args, box, cfg, h_max, n, extras=None, state=None):
    extras = extras or {}
    from sphexa_tpu.propagator.multichip import MULTICHIP_PROPS
    if args.prop in MULTICHIP_PROPS:
        # multi-chip over every attached device (sphexa.cpp under
        # mpiexec -np N); the adapter owns distribution + fail-stops
        from sphexa_tpu.propagator.multichip import MultiChipAdapter
        adapter = MultiChipAdapter(args.prop, box, cfg, state, h_max,
                                   quiet=args.quiet, extras=extras)
        return adapter, adapter.grid
    if args.prop in ("ve-tiered", "ve-tiered-resident", "ve-tiered-bdt"):
        # adaptive-resolution path for clustered density (the focused-
        # octree role): h-tier grids + audited theta-band frames
        import jax

        from sphexa_tpu.propagator.ve_tiered import (
            make_ve_step_pallas_tiered,
            make_ve_step_pallas_tiered_resident)
        assert state is not None, "ve-tiered needs the current state"
        p = state.p
        alive = np.asarray(p.alive)
        # the resident variant trades cell occupancy for drift margin
        # (see choose_tiers grid_slack) so its persistent layouts
        # survive many steps between in-graph rebuilds
        res = args.prop == "ve-tiered-resident"
        # adaptive (slack, theta) ladder — growth headroom first, the
        # exact band audit as the correctness gate
        from sphexa_tpu.propagator.ve_tiered import choose_tiers_auto
        tiers = choose_tiers_auto(box, p.x, p.y, p.z, p.h, alive=alive,
                                  cap_max=128, verbose=not args.quiet)
        if not args.quiet:
            print("# tiers: " + "; ".join(
                f"h[{t.h_lo:.3g},{t.h_hi:.3g}) n={t.grid.n} "
                f"cap={t.grid.cap}" for t in tiers))
        interpret = jax.devices()[0].platform != "tpu"
        if args.prop == "ve-tiered-bdt":
            # block time-steps ON the adaptive tiers (the reference BDT
            # propagator always runs on the focused octree,
            # ve_hydro_bdt.hpp) — rungs per tier cell, gated supercell
            # compute, drift/kick from stored kick state
            from sphexa_tpu.propagator.ve_tiered_bdt import TieredBdtVE
            nr = int(os.environ.get("SPHEXA_BDT_RUNGS", "4"))
            teng = TieredBdtVE(box, tiers, cfg, num_rungs=nr,
                               interpret=interpret)

            class _TieredBdtAdapter:
                """One __call__ = one full rung cycle; fold fail-stops
                route through the main loop's re-tier path (a fresh
                make_stepper re-chooses tiers from the drifted h)."""

                def __init__(self):
                    self.bst = None

                def __call__(self, state):
                    if self.bst is None:
                        self.bst = teng.bind(state)
                    self.bst, diags = teng.run_cycle(self.bst,
                                                     check=False)
                    d = diags[-1]
                    out = teng.unbind(self.bst)
                    fr = float(np.mean([float(x.active_frac)
                                        for x in diags]))
                    if not args.quiet:
                        print(f"# tiered-bdt: active fraction {fr:.2f},"
                              f" rungs "
                              f"{np.asarray(d.rung_hist).tolist()}")
                    fold = max(int(x.fold) for x in diags)

                    class _D:  # minimal diag surface for the main loop
                        dt, ttot, etot = d.dt, d.ttot, d.etot
                        ecin, eint, egrav = d.ecin, d.eint, d.egrav
                        h_max = jax.numpy.max(jax.numpy.where(
                            out.p.alive, out.p.h, 0.0))
                        nc_mean = 0.0
                        max_nc = 0
                        max_cell_count = fold
                        maxvsignal = 0.0
                    return out, _D

            return _TieredBdtAdapter(), tiers
        if args.prop == "ve-tiered-resident":
            # persistent per-tier layouts (incremental focus-tree
            # analog): carry rides in a stateful adapter; a host
            # re-tier (fresh make_stepper) rebinds from scratch
            bind, rstep = make_ve_step_pallas_tiered_resident(
                box, tiers, cfg, interpret=interpret)

            class _TieredResAdapter:
                def __init__(self):
                    self.carry = None

                def __call__(self, state):
                    if self.carry is None:
                        self.carry = bind(state)
                    self.carry, diag = rstep(self.carry)
                    return self.carry.state, diag

            return _TieredResAdapter(), tiers
        return make_ve_step_pallas_tiered(box, tiers, cfg,
                                          interpret=interpret), tiers
    if args.prop == "std-cooling":
        from sphexa_tpu.neighbors import CellGrid, choose_level
        from sphexa_tpu.physics.cooling import CoolingParams
        from sphexa_tpu.propagator.std_cooling import make_std_cooling_step
        grid = CellGrid(choose_level(box, h_max * 1.25))
        cparams = extras.get("cooling_params", CoolingParams())
        if "settings" in extras and any(
                k.startswith("cooling::") for k in extras["settings"]):
            # settings-file cooling::<name> keys (the reference's
            # GRACKLE attribute surface, cooler.hpp:130) override the
            # case defaults
            merged = dict(cparams.to_settings())
            merged.update({k: v for k, v in extras["settings"].items()
                           if k.startswith("cooling::")})
            cparams = CoolingParams.from_settings(merged)
        if "chem" in extras:
            raw = make_std_cooling_step(box, grid, cfg, params=cparams,
                                        with_chemistry=True)

            def step_with_chem(state, _extras=extras, _raw=raw):
                new_state, diag, chem = _raw(state, _extras["chem"])
                _extras["chem"] = chem
                return new_state, diag

            return step_with_chem, grid
        return make_std_cooling_step(box, grid, cfg, params=cparams), grid
    if args.prop == "nbody":
        from sphexa_tpu.propagator.nbody import make_nbody_step
        return make_nbody_step(box, cfg), None
    if args.prop == "turbulence-ve":
        from sphexa_tpu.neighbors import CellGrid, choose_level
        from sphexa_tpu.physics.turbulence import TurbulenceData
        from sphexa_tpu.propagator.turb_ve import TurbVeProp
        grid = CellGrid(choose_level(box, h_max * 1.25))
        turb = TurbulenceData.create(verbose=not args.quiet)
        if "turb" in extras:  # restart: restore OU phases + RNG
            turb.restore(extras["turb"])
        prop = TurbVeProp(box, grid, cfg, turb=turb, verbose=not args.quiet)
        return prop, grid
    if args.prop == "ve-pallas":
        from sphexa_tpu.propagator.ve_pallas import make_ve_step_pallas
        grid = _slot_grid(box, cfg, h_max, n, extras, state)
        import jax
        interpret = jax.devices()[0].platform != "tpu"
        return make_ve_step_pallas(box, grid, cfg, interpret=interpret), grid
    if args.prop in ("ve-bdt", "turbulence-ve-bdt"):
        import jax
        from sphexa_tpu.propagator.ve_bdt import BdtVE, TurbBdtVE
        grid = _slot_grid(box, cfg, h_max, n, extras, state)
        interpret = jax.devices()[0].platform != "tpu"
        if args.prop == "turbulence-ve-bdt":
            # reference TurbVeBdtProp (turb_ve.hpp:114-118)
            from sphexa_tpu.physics.turbulence import TurbulenceData
            turb = TurbulenceData.create(verbose=not args.quiet)
            if "turb" in extras:
                turb.restore(extras["turb"])
            bdt = TurbBdtVE(box, grid, cfg, turb=turb, interpret=interpret)
        else:
            bdt = BdtVE(box, grid, cfg, interpret=interpret)

        bdt_restore = extras.get("bdt")

        class _BdtAdapter:
            """One __call__ = one full rung cycle (2^(nr-1) substeps)."""

            def __init__(self):
                self.bst = None
                self.bdt = bdt
                if getattr(bdt, "turb", None) is not None:
                    self.turb = bdt.turb

            def checkpoint_state(self, n_capacity):
                """Rung state for the writer (timestep.h:29-34 analog);
                run_cycle always leaves substep at a cycle boundary."""
                return bdt.checkpoint_rungs(self.bst, n_capacity)

            def __call__(self, state):
                if self.bst is None:
                    self.bst = bdt.bind_bdt(state)
                    if bdt_restore is not None:
                        # restart: resume the checkpointed rung
                        # assignment instead of re-deriving it
                        self.bst = bdt.restore_rungs(
                            self.bst, bdt_restore["rung"],
                            bdt_restore["dt_m1k"],
                            bdt_restore["dt_min"])
                self.bst, diags = bdt.run_cycle(self.bst)
                d = diags[-1]
                out = bdt.unbind(self.bst.rv, state.p.n)
                import numpy as np
                fr = float(np.mean([float(x.active_frac) for x in diags]))
                print(f"# bdt: active fraction {fr:.2f}, rungs "
                      f"{np.asarray(d.rung_hist).tolist()}")

                ovf = max(int(x.overflow) for x in diags)

                class _D:  # minimal diag surface for the main loop
                    dt, ttot, etot = d.dt, d.ttot, d.etot
                    ecin, eint = d.ecin, d.eint
                    egrav = 0.0
                    h_max = jax.numpy.max(jax.numpy.where(
                        out.p.alive, out.p.h, 0.0))
                    nc_mean = 0.0
                    max_nc = 0
                    max_cell_count = ovf
                    maxvsignal = 0.0
                return out, _D

        return _BdtAdapter(), grid
    from sphexa_tpu.neighbors import CellGrid, choose_level
    grid = CellGrid(choose_level(box, h_max * 1.25))
    if args.prop == "std":
        from sphexa_tpu.propagator.std import make_std_step
        return make_std_step(box, grid, cfg), grid
    from sphexa_tpu.propagator.ve import make_ve_step
    return make_ve_step(box, grid, cfg), grid


def main(argv=None):
    args = parse_args(argv)
    # virtual-device overrides, applied BEFORE backend init (the
    # JAX_PLATFORMS env var is ignored once the TPU plugin registers,
    # so tests drive the multi-chip props with SPHEXA_PLATFORM=cpu
    # SPHEXA_NUM_DEVICES=8)
    plat = os.environ.get("SPHEXA_PLATFORM")
    ndev = os.environ.get("SPHEXA_NUM_DEVICES")
    if plat or ndev:
        import jax
        os.environ.pop("JAX_PLATFORMS", None)
        if plat:
            jax.config.update("jax_platforms", plat)
        if ndev:
            jax.config.update("jax_num_cpu_devices", int(ndev))
    if args.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)
    if args.glass:
        from sphexa_tpu.init.glass import set_glass_template
        set_glass_template(args.glass)
    state, box, cfg, extras = build_sim(args)

    alive = np.asarray(state.p.alive)
    n_active = int(alive.sum())
    h_max = float(np.max(np.asarray(state.p.h)[alive]))
    step_fn, grid = make_stepper(args, box, cfg, h_max, n_active, extras,
                                 state=state)

    def _is_extra_output(it: int, t1: float, t2: float) -> bool:
        for tok in (args.wextra or "").split(","):
            tok = tok.strip()
            if not tok:
                continue
            try:
                if int(tok) == it:
                    return True
                continue
            except ValueError:
                pass
            v = float(tok)
            if t1 < v <= t2:
                return True
        return False

    write_enabled = (args.output_every not in ("0", "") or bool(args.wextra))
    writer = None
    if write_enabled:
        if args.ascii:
            from sphexa_tpu.io.ascii import AsciiWriter
            writer = AsciiWriter(args.outfile)
        else:
            from sphexa_tpu.io.hdf5 import HDF5Writer
            if os.path.exists(args.outfile):
                os.remove(args.outfile)
            writer = HDF5Writer(args.outfile)
            if "settings" in extras:  # provenance (settings.hpp:45)
                writer.write_file_attrs(extras["settings"])

    from sphexa_tpu.observables import conserved_quantities
    from sphexa_tpu.observables.factory import make_observables

    # settings-keyed observable selection (reference:
    # observables/factory.hpp:48-66) — the case name acts as its own
    # settings key, exactly like the reference's checkpoint attributes
    obs = make_observables(extras.get("case"), extras.get("settings"))
    const_f = None
    if args.constants:
        write_header = not (os.path.exists(args.constants)
                            and os.path.getsize(args.constants) > 0)
        const_f = open(args.constants, "a")
        if write_header:
            const_f.write(obs.header() + "\n")

    viz = None
    if args.viz_every:
        from sphexa_tpu.io.viz import VizHook
        viz = VizHook(every=args.viz_every)

    if not args.quiet:
        print(f"# sphexa-tpu: {args.init} N={n_active} prop={args.prop} "
              f"grid={grid}", flush=True)

    profiler_ctx = None
    if args.profile:
        # device-level per-op timing (the TPU analog of the reference's
        # per-substage Timer, util/timer.hpp): traces to ./sphexa-trace
        import jax
        jax.profiler.start_trace("sphexa-trace")
        profiler_ctx = True

    t_start = time.perf_counter()
    # ve-tiered-resident binds (and then donates) the caller's frame, so
    # a pre-step retry point cannot be held for it; on fail-stop it
    # re-tiers from the current state instead of retrying the step
    can_retry = args.prop != "ve-tiered-resident"
    consec_fails = 0
    it = 0
    while it < args.steps:
        t0 = time.perf_counter()
        # retry point: a fail-stopped step ran with truncated candidate
        # sets — its outputs are wrong physics and must be discarded
        # (the reference throws instead, xmass_gpu.cu:120-128; here the
        # adaptive engines re-tier/re-grid and retry). The plain
        # steppers don't donate their input, so holding it is free.
        prev_state = state if can_retry else None
        state, diag = step_fn(state)
        dt_wall = time.perf_counter() - t0

        # fail-stop check FIRST: a truncated step must not be logged,
        # written, or used for grid adaptation.
        # diag.max_cell_count carries two different fail-stop signals:
        # - slot-frame engines (ve-pallas / ve-bdt / ve-tiered*): a
        #   COUNT of dropped/folded particles (layout.overflow, tier
        #   fold) — ANY nonzero value is truncated physics
        # - XLA gather engines (ve / std / ...): the realized max cell
        #   occupancy — bad only past the gather capacity cell_cap
        slot_frame = (args.prop.startswith("ve-tiered")
                      or args.prop in ("ve-pallas", "ve-bdt",
                                       "turbulence-ve-bdt"))
        cell_bad = (int(diag.max_cell_count) > 0 if slot_frame
                    else int(diag.max_cell_count) > cfg.cell_cap)
        if int(diag.max_nc) > cfg.ngpad or cell_bad:
            consec_fails += 1
            if consec_fails > 3:
                raise RuntimeError(
                    f"capacity overflow persists after {consec_fails - 1} "
                    f"re-grids (max_nc={int(diag.max_nc)}, "
                    f"max_cell={int(diag.max_cell_count)})")
            if prev_state is not None:
                state = prev_state   # discard the truncated step
            if args.prop.startswith("ve-tiered"):
                # re-tier: make_stepper re-chooses the h-tier bands from
                # the restored state's realized h distribution (the
                # host-boundary analog of the reference's per-sync
                # focus-tree update, octree_focus_mpi.hpp:138-176)
                if not args.quiet:
                    print(f"# tier fold ({int(diag.max_cell_count)}): "
                          f"re-tiering from "
                          f"{'restored' if can_retry else 'current'} "
                          f"state", file=sys.stderr)
            elif slot_frame:
                # slot overflow: re-pick (cap, grid) with more headroom
                # from the restored positions (bench.py's evolve
                # re-grid policy)
                extras["cap_headroom"] = int(
                    extras.get("cap_headroom", 8)) + 48
                print(f"# slot overflow ({int(diag.max_cell_count)}): "
                      f"re-gridding with headroom "
                      f"{extras['cap_headroom']}", file=sys.stderr)
            else:
                cfg = cfg.replace(
                    ngpad=max(cfg.ngpad, 2 * int(diag.max_nc)),
                    cell_cap=max(cfg.cell_cap,
                                 2 * int(diag.max_cell_count)))
                print(f"# re-gridded with larger caps: ngpad={cfg.ngpad} "
                      f"cell_cap={cfg.cell_cap}", file=sys.stderr)
            h_max = float(np.max(np.asarray(state.p.h)
                                 [np.asarray(state.p.alive)]))
            step_fn, grid = make_stepper(args, box, cfg, h_max,
                                         n_active, extras, state=state)
            continue   # retry this iteration (it is not consumed)
        consec_fails = 0

        # grid resolution follows h growth: rebuild (recompile) on violation
        new_h_max = float(diag.h_max)
        if new_h_max > h_max * 1.25:
            h_max = new_h_max
            step_fn, grid = make_stepper(args, box, cfg, h_max, n_active,
                                         extras, state=state)
            if not args.quiet:
                print(f"# re-gridded for h_max={h_max:.4g}: {grid}")

        # dynamic global box for open boundaries: when particles approach
        # an open face, expand the box and rebuild (the static-shape
        # analog of the reference's per-sync makeGlobalBox,
        # box_mpi.hpp:84 — adaptation at the recompile boundary)
        from sphexa_tpu.sfc.box import Boundary
        if getattr(diag, "bounds", None) is not None and (
                box.bx == Boundary.open or box.by == Boundary.open
                or box.bz == Boundary.open):
            b = np.asarray(diag.bounds, np.float64)
            margin = 2.0 * h_max
            grow = (
                (box.bx == Boundary.open
                 and (b[0] < box.xmin + margin or b[1] > box.xmax - margin))
                or (box.by == Boundary.open
                    and (b[2] < box.ymin + margin or b[3] > box.ymax - margin))
                or (box.bz == Boundary.open
                    and (b[4] < box.zmin + margin or b[5] > box.zmax - margin)))
            if grow:
                pad = 0.15 * max(box.lx, box.ly, box.lz)
                box = box.with_bounds(
                    min(box.xmin, b[0] - pad), max(box.xmax, b[1] + pad),
                    min(box.ymin, b[2] - pad), max(box.ymax, b[3] + pad),
                    min(box.zmin, b[4] - pad), max(box.zmax, b[5] + pad))
                step_fn, grid = make_stepper(args, box, cfg, h_max,
                                             n_active, extras, state=state)
                if not args.quiet:
                    print(f"# box expanded to [{box.xmin:.3g},{box.xmax:.3g}]"
                          f"^3-ish; re-gridded")

        q = conserved_quantities(state.p, cfg, egrav=float(diag.egrav))
        if const_f:
            const_f.write(obs.line(state, diag, cfg, box) + "\n")
            const_f.flush()

        if not args.quiet:
            # reference-style "### Check" iteration line
            # (ipropagator.hpp:100-128)
            print(f"### Check ### iter {int(state.iteration)-1}: "
                  f"t={float(diag.ttot):.6g} dt={float(diag.dt):.4g} "
                  f"etot={float(q.etot):.8g} ecin={float(q.ecin):.6g} "
                  f"eint={float(q.eint):.6g} egrav={float(q.egrav):.6g} "
                  f"nc~{float(diag.nc_mean):.0f} "
                  + (f"h_nonconv={int(diag.h_nonconv)} "
                     if getattr(diag, "h_nonconv", None) is not None
                     and int(diag.h_nonconv) else "")
                  + f"wall={dt_wall*1e3:.0f}ms", flush=True)
        t_now = float(diag.ttot)
        t_prev = t_now - float(diag.dt)
        wall_exceeded = (args.duration is not None
                         and time.perf_counter() - t_start > args.duration)
        triggered = (_is_output_step(it + 1, args.output_every)
                     or _is_output_time(t_prev, t_now, args.output_every)
                     or _is_extra_output(it + 1, t_prev, t_now)
                     or (wall_exceeded and write_enabled))
        if writer and triggered:
            turb_state = None
            if hasattr(step_fn, "turb"):
                turb_state = step_fn.turb.checkpoint_state()
            bdt_state = None
            if hasattr(step_fn, "checkpoint_state"):
                bdt_state = step_fn.checkpoint_state(state.p.n)
            # derived output columns (-f) so the reference's
            # compare_*.py comparators read our dumps directly
            wanted = {t.strip() for t in args.fields.split(",") if t.strip()}
            out_fields = {}
            for name in wanted:
                v = getattr(diag, name, None)
                if v is not None and hasattr(v, "shape") \
                        and getattr(v, "ndim", 0) == 1:
                    out_fields[name] = v
            writer.write_step(state, cfg, box, fields=out_fields or None,
                              turb_state=turb_state, bdt_state=bdt_state)
        if viz:
            viz.execute(state, box, int(state.iteration) - 1)

        it += 1
        if args.sim_time is not None and float(diag.ttot) >= args.sim_time:
            break
        if wall_exceeded:
            if not args.quiet:
                print(f"# wall-clock limit {args.duration}s reached")
            break

    if profiler_ctx:
        import jax
        import jax.numpy as jnp
        # a real device->host readback: block_until_ready is not a
        # reliable barrier through remote-device tunnels
        _ = float(jnp.sum(jnp.where(jnp.isfinite(state.p.x), 1.0, 0.0)))
        jax.profiler.stop_trace()
        print("# profile trace written to ./sphexa-trace")
        try:
            from sphexa_tpu.util.xprofile import print_table
            print_table("sphexa-trace", steps=max(int(state.iteration), 1))
        except Exception as e:   # parsing needs the tf tsl protos
            print(f"# (per-kernel table unavailable: {e})")

    wall = time.perf_counter() - t_start
    if not args.quiet:
        its = int(state.iteration) - 1
        print(f"# done: {its} iterations, {wall:.1f}s wall, "
              f"{n_active * max(it, 1) / wall / 1e6:.2f}M particle-updates/s")
    if writer:
        writer.close()
    if const_f:
        const_f.close()
    return state


if __name__ == "__main__":
    main()
