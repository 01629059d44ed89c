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


if __name__ == "__main__":
    main()
