"""Headline benchmark: VE-step throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: particle-updates per second for the full VE step at side^3
particles. Baseline target: 50e6 particle-updates/s on one TPU chip
(BASELINE.md north star — defined on a v5p; the bench chip is a v5e).

On TPU this uses the cell-major-resident Pallas engine (state lives in
the slot frame; layout rebins happen in-graph on a drift margin); on
CPU (no TPU available) it falls back to the XLA gather path at a small
size.

Timing: the axon tunnel's `block_until_ready` is a no-op, so every
timed region ends with a real device->host scalar readback; the fixed
~35-40 ms readback latency is cancelled by rep-scaling (time 2 steps
vs 2+iters steps, divide the difference by iters).

Env knobs: SPHEXA_BENCH_SIDE (default 100 on TPU), SPHEXA_BENCH_CASE
in {sedov, noh, evrard} (BASELINE.md's benchmark configs; evrard uses
a deep CAP whose uncached Mosaic compile takes tens of minutes),
SPHEXA_BENCH_PROP=ve-bdt for block-timestep active-update accounting,
SPHEXA_BENCH_CAP to override the slot cap. Every run appends to
BENCH_HISTORY.jsonl and warns on >10% regressions.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov

BASELINE_PUPS = 50e6  # particle-updates/sec north star (BASELINE.md)


def _pick_cap_grid(state, box, h_eff, n, headroom=0):
    """(cap, grid) for the Pallas engine: SPHEXA_BENCH_CAP override, or
    the joint scan in cellmajor.choose_cap_and_grid (guarantees a legal
    z-supercell AND that the ICs fit the slots — the two constraints
    whose mismatch crashed the round-2 bench)."""
    import numpy as np

    from sphexa_tpu.ops.cellmajor import choose_cap_and_grid, choose_cm_grid

    alive = np.asarray(state.p.alive)
    xs = np.asarray(state.p.x)[alive]
    ys = np.asarray(state.p.y)[alive]
    zs = np.asarray(state.p.z)[alive]
    cap = int(os.environ.get("SPHEXA_BENCH_CAP", 0))
    if cap:
        return cap, choose_cm_grid(box, h_eff, n, cap=cap)
    return choose_cap_and_grid(box, h_eff, n, xs, ys, zs,
                               headroom=headroom)


def _plan_128(state, box, cfg, n, headroom):
    """(cap, grid, cfg, state) INSIDE the proven cap-128 compile
    envelope (tpu_queue8: the v5e remote compile dies at cap >= 256).
    First the plain joint scan at the realized h; on deep contrast the
    bounded-h plan (SphConfig.h_cap, the sedov_gate lever): clamp the
    rarefied-tail h so the occupancy-sized grid stays legal."""
    import numpy as np

    from sphexa_tpu.ops.cellmajor import (choose_cap_and_grid,
                                          choose_grid_with_hcap)

    alive = np.asarray(state.p.alive)
    xs = np.asarray(state.p.x)[alive]
    ys = np.asarray(state.p.y)[alive]
    zs = np.asarray(state.p.z)[alive]
    h_alive = np.asarray(state.p.h)[alive]
    h_eff = float(h_alive.max()) * 1.2
    try:
        cap, grid = choose_cap_and_grid(box, h_eff, n, xs, ys, zs,
                                        cap_max=128, headroom=headroom)
        return cap, grid, cfg, state
    except ValueError:
        cap, grid, h_cap = choose_grid_with_hcap(
            box, n, xs, ys, zs, cap_max=128, headroom=headroom)
        frac = float((h_alive > h_cap).mean())
        print(f"# h-cap plan: cap={cap} grid={grid} h_cap={h_cap:.4g} "
              f"(clamps {100 * frac:.2f}%)", file=__import__("sys").stderr)
        assert frac < 0.05, f"h_cap would clamp {frac:.1%} of particles"
        cfg = cfg.replace(h_cap=float(h_cap))
        state = state.replace(p=state.p.replace(
            h=np.minimum(np.asarray(state.p.h), h_cap)))
        return cap, grid, cfg, state


def main():
    small = os.environ.get("SPHEXA_BENCH_SMALL")
    # CPU-forcing for verification runs while the TPU tunnel is down
    # (backend init HANGS when the tunnel half-dies; JAX_PLATFORMS is
    # ignored once the plugin registers, so use the config override)
    plat = os.environ.get("SPHEXA_PLATFORM")
    if plat:
        os.environ.pop("JAX_PLATFORMS", None)
        jax.config.update("jax_platforms", plat)
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception as e:  # backend init failure (e.g. TPU tunnel down)
        print(json.dumps({
            "metric": "particle_updates_per_sec", "value": 0, "unit": "pups",
            "vs_baseline": 0.0,
            "error": f"backend init failed: {type(e).__name__}: {str(e)[:300]}",
        }))
        raise SystemExit(1)
    side = (30 if small else 100) if on_tpu else 20
    side = int(os.environ.get("SPHEXA_BENCH_SIDE", side))
    warmup = 2
    iters = 8 if on_tpu else 3

    # BASELINE.md benchmark configs: sedov (default), noh (shock +
    # conservation), evrard (self-gravity via the conv-FMM).
    # dt0 is small on purpose: step cost is dt-independent, but the
    # joint cap+grid scan picks zero-headroom caps, so large dt lets
    # Sedov compression overflow the tail cells within the ~20 bench
    # steps (observed at dt0=1e-4: overflow from step ~21).
    case = os.environ.get("SPHEXA_BENCH_CASE", "sedov")
    cfg = SphConfig()
    if os.environ.get("SPHEXA_CLAMP_BUDGET"):
        # looser tier-roof clamp budget for bench runs: rides out the
        # sphere-edge nc-deficiency transient (up to ~14% of alive at
        # evrard-30) in ONE plan — a re-tier would build a second
        # differing-plan engine, the v5e poison (DESIGN.md 'The v5e
        # second-engine poison')
        cfg = cfg.replace(clamp_frac_budget=float(
            os.environ["SPHEXA_CLAMP_BUDGET"]))
    if case == "noh":
        from sphexa_tpu.init.noh import init_noh
        state, box, cfg = init_noh(side, cfg, dt0=1e-5)
    elif case == "evrard":
        from sphexa_tpu.init.evrard import init_evrard
        state, box, cfg = init_evrard(side, cfg, dt0=3e-5)
        cfg = cfg.replace(gravity_solver="fmm")
    else:
        state, box, cfg = init_sedov(side, cfg, dt0=3e-5)
    n = side ** 3

    bdt = os.environ.get("SPHEXA_BENCH_PROP") == "ve-bdt"
    updates = float(n) * iters
    if bdt and (on_tpu or os.environ.get("SPHEXA_BENCH_FORCE")):
        # block-time-step mode: cycles of gated substeps; throughput
        # counts ACTIVE particle updates (the individual-timestep
        # accounting of ve_hydro_bdt.hpp) — inactive rungs cost ~no
        # compute via the pl.when supercell gates.
        # SPHEXA_BENCH_EVOLVE=N first evolves the IC N steps with the
        # global-dt engine: at t=0 the Sedov rungs are degenerate (all
        # particles courant-limited alike) and BDT only pays once the
        # shock has developed a dt hierarchy (VERDICT r2 item 8).
        import numpy as np

        from sphexa_tpu.propagator.ve_bdt import BdtVE
        from sphexa_tpu.propagator.ve_pallas import ResidentVE

        h_max = float(np.max(np.asarray(state.p.h)[np.asarray(state.p.alive)]))
        cap, grid = _pick_cap_grid(state, box, h_max * 1.2, n)
        interp = not on_tpu   # CPU validation runs (SPHEXA_BENCH_FORCE)
        evolve = int(os.environ.get("SPHEXA_BENCH_EVOLVE", 0))
        if evolve:
            # chunked evolve with host re-grid on slot overflow (the
            # CLI loop's fail-stop + re-grid path, main.py:571-586):
            # Sedov compression outgrows the zero-headroom cap scan
            # well before 80 steps at side 100.
            import sys as _sys
            pre = ResidentVE(box, grid, cfg, interpret=interp)
            rst = pre.bind(state)
            done, headroom = 0, 0
            while done < evolve:
                chunk = min(evolve - done, 16)
                # steps() donates its input frame, so snapshot the
                # retry point BEFORE stepping
                saved = pre.unbind(rst, state.p.n)
                rst, prediags = pre.steps(rst, chunk)
                if int(np.max(np.asarray(prediags.overflow))) != 0:
                    headroom += 48
                    if headroom > 192:
                        raise SystemExit("overflow persists after "
                                         "repeated evolve re-grids")
                    state = saved
                    # stay INSIDE the cap-128 compile envelope: the
                    # unconstrained re-grid picked cap 256 on the
                    # evolved shock (queue6/queue10) — the v5e compile
                    # wall — where the bounded-h plan keeps cap 128 by
                    # clamping the rarefied tail
                    cap, grid, cfg, state = _plan_128(state, box, cfg, n,
                                                      headroom)
                    print(f"# evolve re-grid at step {done}: cap->{cap} "
                          f"(headroom {headroom}, hcap={cfg.h_cap:.4g})",
                          file=_sys.stderr)
                    pre = ResidentVE(box, grid, cfg, interpret=interp)
                    rst = pre.bind(state)
                    continue
                done += chunk
            state = pre.unbind(rst, state.p.n)
            print(f"# evolved {evolve} steps to t={float(state.ttot):.4g} "
                  f"before BDT binding", file=__import__('sys').stderr)
            # re-pick the slot geometry for the evolved (compressed)
            # density field, keeping drift headroom for the timed region
            cap2, grid2, cfg, state = _plan_128(state, box, cfg, n,
                                                max(headroom, 32))
            if grid2 != grid:
                print(f"# re-grid for evolved state: cap {cap}->{cap2} "
                      f"(hcap={cfg.h_cap:.4g})",
                      file=__import__('sys').stderr)
                cap, grid = cap2, grid2
                evolve = 0   # pre engine no longer matches the grid
        import sys

        # plain-engine reference on the SAME state: BDT's honest win
        # is SIM-TIME advanced per wall-second (with exact gating,
        # active-pups <= plain-pups algebraically — the dt hierarchy is
        # where individual timesteps pay, ve_hydro_bdt.hpp's purpose).
        # BOTH scan lengths are warmed before the timed region (the
        # round-4 numbers timed the iters-scan's ~50 s Mosaic compile
        # inside the plain side, inflating the "speedup" to 280x —
        # BENCH_HISTORY entries at ea5e120, invalidated below), and the
        # fixed ~100 ms tunnel dispatch+readback latency is cancelled
        # long-minus-short exactly like the plain-bench path.
        ref = (ResidentVE(box, grid, cfg, interpret=interp)
               if not evolve else pre)
        rref = ref.bind(state)
        rref, _d = ref.steps(rref, 1)        # compiles the 1-step scan
        _ = float(rref.x[0])
        rref, _d = ref.steps(rref, iters)    # compiles + warms the iters scan
        _ = float(rref.x[0])
        t_ref0 = float(rref.ttot)
        t0 = time.perf_counter()
        rref, refdiags = ref.steps(rref, iters)
        _ = float(rref.x[0])
        t_long = time.perf_counter() - t0
        sim_long = float(rref.ttot) - t_ref0
        t_ref0 = float(rref.ttot)
        t0 = time.perf_counter()
        rref, _d = ref.steps(rref, 1)
        _ = float(rref.x[0])
        t_short = time.perf_counter() - t0
        sim_short = float(rref.ttot) - t_ref0
        assert int(np.max(np.asarray(refdiags.overflow))) == 0, (
            "plain reference overflowed during the timed region")
        ref_wall = max(t_long - t_short, 1e-9)
        ref_rate = (sim_long - sim_short) / ref_wall
        ref_pups = n * (iters - 1) / ref_wall

        eng = BdtVE(box, grid, cfg, interpret=interp)
        bst = eng.bind_bdt(state)
        bst, diags = eng.run_cycle(bst)   # warmup cycle (compiles)
        _ = float(diags[-1].dt)
        cycles = max(2, iters // (1 << (eng.num_rungs - 1)))
        t_b0 = float(bst.rv.ttot)
        t0 = time.perf_counter()
        all_diags = []
        for _ in range(cycles):
            bst, diags = eng.run_cycle(bst)
            all_diags += diags
        _ = float(all_diags[-1].dt)   # device readback barrier
        dt_wall = time.perf_counter() - t0
        # accounting read back AFTER the timed region
        updates = sum(float(d.active_frac) for d in all_diags) * float(n)
        pups = updates / dt_wall
        bdt_rate = (float(bst.rv.ttot) - t_b0) / dt_wall
        fr = updates / (len(all_diags) * n)
        print(f"# bdt: active fraction {fr:.3f}, simtime/wall "
              f"{bdt_rate:.3e} vs plain {ref_rate:.3e} "
              f"(x{bdt_rate / max(ref_rate, 1e-30):.2f}); "
              f"active-pups {pups / 1e6:.2f}M vs plain "
              f"{ref_pups / 1e6:.2f}M pups", file=sys.stderr)
        print(json.dumps({
            "metric": f"{case}_bdt_simtime_per_wallsec",
            "value": bdt_rate, "unit": "simtime/s",
            "vs_baseline": bdt_rate / max(ref_rate, 1e-30),
        }))
        _append_history(pups, side, "tpu", case=f"{case}-bdt")
        _append_history(bdt_rate / max(ref_rate, 1e-30), side, "tpu",
                        case=f"{case}-bdt-speedup")
        return
    if on_tpu and os.environ.get("SPHEXA_BENCH_PROP") == "ve-tiered-bdt":
        # block time-steps ON the adaptive tiers (BDT x tiers, the
        # last lever pairing): metric is SIM-TIME advanced per
        # wall-second vs the plain tiered engine on the same state —
        # the dt hierarchy of the clustered field (h contrast ~10x ->
        # courant-dt contrast ~10x) is where rung gating pays.
        import sys

        import numpy as np

        from sphexa_tpu.propagator.ve_tiered import (
            choose_tiers_auto, make_ve_step_pallas_tiered)
        from sphexa_tpu.propagator.ve_tiered_bdt import TieredBdtVE

        p = state.p
        alive = np.asarray(p.alive)
        tiers = choose_tiers_auto(box, p.x, p.y, p.z, p.h, alive=alive,
                                  cap_max=128)
        print(f"# tiers: {[(t.grid.n, t.grid.cap) for t in tiers]}",
              file=sys.stderr)

        # plain tiered reference: simtime/wall on the same state, with
        # the main-loop re-tier semantics on fold (fresh bands from the
        # drifted h field; queue4 2026-08-19 folded here after ~10
        # eager steps)
        for attempt in range(3):
            step1 = make_ve_step_pallas_tiered(box, tiers, cfg)
            st = state
            prev = st
            folds = []
            for _ in range(2):
                prev = st
                st, _d = step1(st)
                _ = float(st.p.x[0])
                folds.append(_d)
            if not any(int(d.max_cell_count) for d in folds):
                t_ref0 = float(st.ttot)
                t0 = time.perf_counter()
                diags_ref = []
                for _ in range(iters):
                    prev = st
                    st, dref = step1(st)
                    diags_ref.append(dref)
                _ = float(st.p.x[0])
                ref_wall = time.perf_counter() - t0
                folds = diags_ref
                if not any(int(d.max_cell_count) for d in folds):
                    break
            # decompose the fold with a forces-only pass on the last
            # good state (the diag only carries the folded sum)
            from sphexa_tpu.propagator.ve_tiered import (_build_layouts,
                                                         _tier_engines,
                                                         _tiered_forces)
            engs = _tier_engines(tiers, cfg, False)
            parts = jax.jit(lambda s: _tiered_forces(
                s.p, s.dt, _build_layouts(engs, box, s.p), engs, box,
                cfg)["fold_parts"])(prev)
            print(f"# tiered ref fold [ovf, unowned, miss, clamp]="
                  f"{np.asarray(parts).tolist()}; re-tiering from the "
                  f"drifted state (attempt {attempt + 1})",
                  file=sys.stderr)
            p2 = prev.p
            tiers = choose_tiers_auto(box, p2.x, p2.y, p2.z, p2.h,
                                      alive=np.asarray(p2.alive),
                                      cap_max=128)
            state = prev   # restart the phase from the last good state
        else:
            raise AssertionError("tiered ref folds persist after 3 "
                                 "re-tiers")
        ref_rate = (float(st.ttot) - t_ref0) / ref_wall

        eng = TieredBdtVE(box, tiers, cfg)
        bst = eng.bind(state)
        bst, diags = eng.run_cycle(bst, check=False)   # warmup+compile
        _ = float(diags[-1].dt)
        cycles = max(2, iters // (1 << (eng.num_rungs - 1)))
        t_b0 = float(bst.ttot)
        t0 = time.perf_counter()
        all_diags = []
        for _ in range(cycles):
            bst, diags = eng.run_cycle(bst, check=False)
            all_diags += diags
        _ = float(all_diags[-1].dt)
        dt_wall = time.perf_counter() - t0
        fold = max(int(d.fold) for d in all_diags)
        assert fold == 0, f"tiered-BDT fold={fold} (re-tier needed)"
        bdt_rate = (float(bst.ttot) - t_b0) / dt_wall
        fr = sum(float(d.active_frac) for d in all_diags) / len(all_diags)
        print(f"# tiered-bdt: active fraction {fr:.3f}, simtime/wall "
              f"{bdt_rate:.3e} vs plain tiered {ref_rate:.3e} "
              f"(x{bdt_rate / max(ref_rate, 1e-30):.2f})",
              file=sys.stderr)
        print(json.dumps({
            "metric": f"{case}_tiered_bdt_simtime_per_wallsec",
            "value": bdt_rate, "unit": "simtime/s",
            "vs_baseline": bdt_rate / max(ref_rate, 1e-30),
        }))
        _append_history(bdt_rate / max(ref_rate, 1e-30), side, "tpu",
                        case=f"{case}-tiered-bdt-speedup")
        return
    if case == "evrard" and (on_tpu or os.environ.get("SPHEXA_BENCH_FORCE")):
        # clustered density: the tiered engine (audited h-band zoom
        # grids, CAP <= 128) replaces the deep-CAP uniform grid whose
        # Mosaic compile took tens of minutes (VERDICT r2 item 3)
        import numpy as np

        from sphexa_tpu.propagator.ve_tiered import (
            make_ve_step_pallas_tiered,
            make_ve_step_pallas_tiered_resident)

        # default: the persistent-layout engine (incremental focus-tree
        # analog); SPHEXA_BENCH_TIERED=rebuild times the per-step
        # relayout variant for comparison
        import sys as _sys

        from sphexa_tpu.propagator.ve_tiered import (_build_layouts,
                                                     _tier_engines,
                                                     _tiered_forces,
                                                     choose_tiers_auto)

        resident = os.environ.get("SPHEXA_BENCH_TIERED",
                                  "resident") != "rebuild"
        # split gravity defaults ON for TPU runs: the fused Pallas+FMM
        # program crashes the v5e worker at Evrard-50 scale
        # (queue5/queue7 logs 2026-08-19) while N split programs are
        # stable; SPHEXA_SPLIT_GRAVITY=0 forces the fused form.
        split = os.environ.get("SPHEXA_SPLIT_GRAVITY",
                               "1" if on_tpu else "0") == "1"

        def fold_parts_of(tiers, s):
            engs = _tier_engines(tiers, cfg, False)
            return np.asarray(jax.jit(lambda q: _tiered_forces(
                q.p, q.dt, _build_layouts(engs, box, q.p), engs, box,
                cfg)["fold_parts"])(s)).tolist()

        # re-tier-on-fold (main.py retry semantics): a fold block is
        # DISCARDED, fresh bands follow the drifted h field (vacuum-edge
        # envelopes legitimately outgrow the top band during collapse)
        from sphexa_tpu.propagator.ve_tiered import choose_tiers_robust
        cfg_evr = cfg
        # ~10 attempts, each advancing ~a block before folding: the
        # sphere-edge nc-deficiency transient grows edge h every step
        # for the first ~20 steps (independent of dt0) — re-tiers ride
        # it out until the edge h settles at nc ~ ng0, after which the
        # timed region is fold-free
        for attempt in range(10):
            p = state.p
            alive = np.asarray(p.alive)
            # robust ladder (never raises): the h-clip form caps the
            # envelope tail via SphConfig.h_cap, so clamp folds cannot
            # recur every block (queue10: 2.6% of N rode the tier roof
            # and re-folded each attempt); escalating slot headroom
            # like the gates
            tiers, h_clip = choose_tiers_robust(
                box, p.x, p.y, p.z, p.h, alive=alive, cap_max=128,
                headroom=8 << min(attempt, 3),
                clip_quantiles=(1.0, 0.995, 0.98, 0.95, 0.9, 0.8))
            assert tiers is not None, (
                "no tier ladder even with h-clip — the tiered bench "
                "has no meaning on the XLA fallback")
            if h_clip is not None:
                cfg_evr = cfg.replace(h_cap=float(h_clip))
                state = state.replace(p=state.p.replace(
                    h=jnp.minimum(state.p.h, h_clip)))
            else:
                cfg_evr = cfg
            print(f"# tiers ({'resident' if resident else 'rebuild'}, "
                  f"attempt {attempt}): "
                  f"{[(t.grid.n, t.grid.cap) for t in tiers]} "
                  f"hcap={cfg_evr.h_cap:.4g}",
                  file=_sys.stderr)
            if resident:
                bind, step1 = make_ve_step_pallas_tiered_resident(
                    box, tiers, cfg_evr, interpret=not on_tpu,
                    split_gravity=split)
                st = bind(state)
                leaf = lambda s: s.state.p.x
                pstate = lambda s: s.state
            else:
                step1 = make_ve_step_pallas_tiered(box, tiers, cfg_evr,
                                                   interpret=not on_tpu,
                                                   split_gravity=split)
                st = state
                leaf = lambda s: s.p.x
                pstate = lambda s: s

            scans = {}

            def run(st, k):
                if split:
                    # split-gravity steps are python composites of two
                    # programs — scanning would inline them back into
                    # ONE combined executable (the crashing shape).
                    # Dispatch is async, so the python loop still
                    # pipelines; the single trailing readback keeps the
                    # timing contract.
                    ds = []
                    for _ in range(k):
                        st, d = step1(st)
                        ds.append(d)
                    _ = float(leaf(st)[0])
                    diags = jax.tree.map(lambda *xs: jnp.stack(xs), *ds)
                    return st, diags
                if k not in scans:
                    def body(s, _):
                        s2, d = step1(s)
                        return s2, d
                    scans[k] = jax.jit(lambda s: jax.lax.scan(
                        body, s, None, length=k))
                st, diags = scans[k](st)
                _ = float(leaf(st)[0])   # real readback
                return st, diags

            def block(st, k):
                st2, d = run(st, k)
                return st2, d, int(np.max(np.asarray(d.max_cell_count)))

            folded = prev = None
            for k in [1] * warmup + [iters]:
                prev = st
                st, _d, fold = block(st, k)
                if fold:
                    folded = (st, tiers, _d)
                    break
            if folded is None:
                prev = st
                t0 = time.perf_counter()
                st, diags, fold = block(st, iters)
                t_long = time.perf_counter() - t0
                if fold:
                    folded = (st, tiers, diags)
            if folded is None:
                t0 = time.perf_counter()
                st, _d, _f = block(st, 1)
                t_short = time.perf_counter() - t0
                dt_wall = max(t_long - t_short, 1e-9) / (iters - 1)
                state = pstate(st)
                if resident:
                    print(f"# resident: {int(st.rebuilds)} layout "
                          f"rebuilds in {2 * iters + warmup + 2} steps",
                          file=_sys.stderr)
                break
            bad_st, bad_tiers, bad_d = folded
            print(f"# tiered fold trail "
                  f"{np.asarray(bad_d.max_cell_count).tolist()}; "
                  f"[ovf, unowned, miss, clamp]="
                  f"{fold_parts_of(bad_tiers, pstate(bad_st))}; "
                  f"re-tiering (attempt {attempt + 1})",
                  file=_sys.stderr)
            state = pstate(prev)   # discard the folded block
        else:
            raise AssertionError("tiered folds persist after 10 re-tiers")
        # physics gate: the bench barely advances t, so the density must
        # still track the analytic IC law rho = M / (2 pi R^2 r)
        # (evrard_solution.py digitizes the later-time PPM profiles)
        alive = np.asarray(state.p.alive)
        r = np.sqrt(np.asarray(state.p.x) ** 2 + np.asarray(state.p.y) ** 2
                    + np.asarray(state.p.z) ** 2)[alive]
        rho = np.asarray(diags.rho[-1])[alive]
        sel = (r > 0.05) & (r < 0.9)    # away from center smearing + edge
        rho_ana = 1.0 / (2.0 * np.pi * np.maximum(r[sel], 1e-6))
        l1 = float(np.mean(np.abs(rho[sel] - rho_ana) / rho_ana))
        print(f"# evrard L1(rho vs 1/(2 pi r)) = {l1:.4f}",
              file=__import__('sys').stderr)
        assert l1 < 0.15, f"evrard density profile off: L1={l1}"
    elif on_tpu:
        import numpy as np

        from sphexa_tpu.propagator.ve_pallas import ResidentVE

        h_max = float(np.max(np.asarray(state.p.h)[np.asarray(state.p.alive)]))
        cap, grid = _pick_cap_grid(state, box, h_max * 1.2, n)
        eng = ResidentVE(box, grid, cfg)

        # steps chained in-graph with lax.scan: one dispatch per block
        # (each dispatch through the tunnel costs ~100 ms of launch gap)
        def run(rst, k):
            rst, diags = eng.steps(rst, k)
            _ = float(rst.x[0])  # real readback (block_until_ready no-ops)
            return rst, diags

        def measure(state0):
            rst = eng.bind(state0)
            assert int(rst.overflow) == 0, "cell CAP overflow at bind"
            for _ in range(warmup):     # compiles the 1-step scan + warms
                rst, _d1 = run(rst, 1)
            rst, _diags = run(rst, iters)  # compiles + warms the iters scan
            t0 = time.perf_counter()
            rst, diags = run(rst, iters)
            t_long = time.perf_counter() - t0
            # subtract fixed dispatch+readback latency via a 1-step run
            t0 = time.perf_counter()
            rst, _d1 = run(rst, 1)
            t_short = time.perf_counter() - t0
            dt = max(t_long - t_short, 1e-9) / (iters - 1)
            return dt, int(diags.overflow[-1]), diags

        dt_wall, ovf, diags = measure(state)
        if ovf:
            # fail-stop with one retry (main.py's re-grid spirit): the
            # drift overflowed the zero-headroom cap — rerun the timed
            # region from t=0 with 4x less drift per step
            import sys
            print(f"# bench overflow={ovf} at dt0={float(state.dt)}; "
                  "retrying from t=0 with dt0/4", file=sys.stderr)
            state = state.replace(dt=state.dt / 4, dt_m1=state.dt_m1 / 4)
            dt_wall, ovf, diags = measure(state)
        assert ovf == 0, (
            "cell CAP overflow during run: "
            f"overflow={np.asarray(diags.overflow).tolist()} "
            f"rebinned={np.asarray(diags.rebinned).tolist()} "
            f"need_regrid={np.asarray(diags.need_regrid).tolist()} "
            f"cap={cap} grid={grid}")
    else:
        from sphexa_tpu.neighbors import CellGrid, choose_level
        from sphexa_tpu.propagator.ve import make_ve_step

        grid = CellGrid(choose_level(box, float(state.p.h[0]) * 1.2))
        step = make_ve_step(box, grid, cfg)

        for _ in range(warmup):
            state, diag = step(state)
        jax.block_until_ready(state.p.x)

        t0 = time.perf_counter()
        for _ in range(iters):
            state, diag = step(state)
        jax.block_until_ready(state.p.x)
        dt_wall = (time.perf_counter() - t0) / iters

    pups = n / dt_wall
    # engine annotation (ADVICE r4): a fallback path's throughput must
    # be distinguishable from the Pallas engines' in the records
    if case == "evrard" and (on_tpu or os.environ.get("SPHEXA_BENCH_FORCE")):
        engine = ("tiered-resident" if os.environ.get(
            "SPHEXA_BENCH_TIERED", "resident") != "rebuild"
            else "tiered-rebuild")
    elif on_tpu:
        engine = "resident"
    else:
        engine = "xla"
    print(json.dumps({
        "metric": f"{case}_particle_updates_per_sec",
        "value": pups,
        "unit": "particles/s",
        "vs_baseline": pups / BASELINE_PUPS,
        "engine": engine,
    }))
    _append_history(pups, side, jax.devices()[0].platform, case,
                    engine=engine)


def _append_history(pups: float, side: int, platform: str,
                    case: str = "sedov", engine: str = ""):
    """Regression tracking (the ReFrame-CI analog of the reference's
    nightly perf binaries, .jenkins/reframe_ci.py): append every run to
    BENCH_HISTORY.jsonl with the git revision, and warn on stderr if
    throughput regressed >10% vs the best recorded run at the same
    (side, platform)."""
    import subprocess
    import sys
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))
                             ).stdout.strip()
    except Exception:
        rev = "unknown"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_HISTORY.jsonl")
    best = 0.0
    try:
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                if r.get("invalid"):
                    continue   # tagged measurement-methodology victims
                if r.get("side") == side and r.get("platform") == platform \
                        and r.get("case", "sedov") == case:
                    best = max(best, r.get("pups", 0.0))
    except FileNotFoundError:
        pass
    with open(path, "a") as f:
        rec = {"ts": time.time(), "rev": rev, "side": side,
               "platform": platform, "case": case, "pups": pups}
        if engine:
            rec["engine"] = engine
        f.write(json.dumps(rec) + "\n")
    if best > 0 and pups < 0.9 * best:
        print(f"# PERF REGRESSION: {pups / 1e6:.2f}M < 90% of best "
              f"{best / 1e6:.2f}M (side={side}, {platform})",
              file=sys.stderr)


if __name__ == "__main__":
    main()
