"""Headline benchmark: Sedov blast throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: particle-updates per second for the full VE step at Sedov
side^3 particles. Baseline target: 50e6 particle-updates/s on one TPU
chip (BASELINE.md north star).

On TPU this uses the cell-major-resident Pallas engine (state lives in
the slot frame; layout rebins happen in-graph on a drift margin); on
CPU (no TPU available) it falls back to the XLA gather path at a small
size.
"""

from __future__ import annotations

import json
import os
import time

import jax

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov

BASELINE_PUPS = 50e6  # particle-updates/sec north star (BASELINE.md)


def main():
    small = os.environ.get("SPHEXA_BENCH_SMALL")
    on_tpu = jax.devices()[0].platform == "tpu"
    side = (30 if small else 100) if on_tpu else 20
    side = int(os.environ.get("SPHEXA_BENCH_SIDE", side))
    warmup = 3
    iters = 10 if on_tpu else 3

    cfg = SphConfig()
    state, box, cfg = init_sedov(side, cfg, dt0=1e-4)
    n = side ** 3

    bdt = os.environ.get("SPHEXA_BENCH_PROP") == "ve-bdt"
    updates = float(n) * iters
    if on_tpu and bdt:
        # block-time-step mode: cycles of gated substeps; throughput
        # counts ACTIVE particle updates (the individual-timestep
        # accounting of ve_hydro_bdt.hpp) — inactive rungs cost ~no
        # compute via the pl.when supercell gates
        from sphexa_tpu.ops.cellmajor import choose_cm_grid
        from sphexa_tpu.propagator.ve_bdt import BdtVE

        cap = int(os.environ.get("SPHEXA_BENCH_CAP", 64))
        grid = choose_cm_grid(box, float(state.p.h[0]) * 1.2, n, cap=cap)
        eng = BdtVE(box, grid, cfg)
        bst = eng.bind_bdt(state)
        bst, diags = eng.run_cycle(bst)   # warmup cycle (compiles)
        _ = float(diags[-1].dt)
        cycles = max(2, iters // (1 << (eng.num_rungs - 1)))
        t0 = time.perf_counter()
        all_diags = []
        for _ in range(cycles):
            bst, diags = eng.run_cycle(bst)
            all_diags += diags
        _ = float(all_diags[-1].dt)   # readback barrier
        dt_wall = time.perf_counter() - t0
        # active-update accounting read back AFTER the timed region
        updates = sum(float(d.active_frac) for d in all_diags) * float(n)
        pups = updates / dt_wall
        print(json.dumps({
            "metric": "sedov_bdt_active_updates_per_sec",
            "value": pups, "unit": "particles/s",
            "vs_baseline": pups / BASELINE_PUPS,
        }))
        return
    if on_tpu:
        from sphexa_tpu.ops.cellmajor import choose_cm_grid
        from sphexa_tpu.propagator.ve_pallas import ResidentVE

        cap = int(os.environ.get("SPHEXA_BENCH_CAP", 64))
        grid = choose_cm_grid(box, float(state.p.h[0]) * 1.2, n, cap=cap)
        eng = ResidentVE(box, grid, cfg)
        rst = eng.bind(state)
        assert int(rst.overflow) == 0, "cell CAP overflow at bind"

        for _ in range(warmup):
            rst, diag = eng.step(rst)
        jax.block_until_ready(rst.x)

        t0 = time.perf_counter()
        for _ in range(iters):
            rst, diag = eng.step(rst)
        jax.block_until_ready(rst.x)
        dt_wall = (time.perf_counter() - t0) / iters
        assert int(diag.overflow) == 0, "cell CAP overflow during run"
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
    print(json.dumps({
        "metric": "sedov_particle_updates_per_sec",
        "value": pups,
        "unit": "particles/s",
        "vs_baseline": pups / BASELINE_PUPS,
    }))
    _append_history(pups, side, jax.devices()[0].platform)


def _append_history(pups: float, side: int, platform: str):
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
                if r.get("side") == side and r.get("platform") == platform:
                    best = max(best, r.get("pups", 0.0))
    except FileNotFoundError:
        pass
    with open(path, "a") as f:
        f.write(json.dumps({"ts": time.time(), "rev": rev, "side": side,
                            "platform": platform, "pups": pups}) + "\n")
    if best > 0 and pups < 0.9 * best:
        print(f"# PERF REGRESSION: {pups / 1e6:.2f}M < 90% of best "
              f"{best / 1e6:.2f}M (side={side}, {platform})",
              file=sys.stderr)


if __name__ == "__main__":
    main()
