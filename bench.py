"""Headline benchmark: Sedov blast throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: particle-updates per second for the full VE step (neighbor build
+ 5 pair stages + dt + integration) at Sedov side^3 particles.
Baseline target: 50e6 particle-updates/s on one TPU v5p chip (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import jax

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.propagator.ve import make_ve_step

BASELINE_PUPS = 50e6  # particle-updates/sec north star (BASELINE.md)


def main():
    small = os.environ.get("SPHEXA_BENCH_SMALL")
    on_cpu = jax.devices()[0].platform == "cpu"
    side = 30 if (small or on_cpu) else 100
    warmup = 2
    iters = 5 if (small or on_cpu) else 10

    cfg = SphConfig(chunk=8192, cell_cap=96, ngpad=160)
    state, box, cfg = init_sedov(side, cfg, dt0=1e-4)
    n = side ** 3
    grid = CellGrid(choose_level(box, float(state.p.h[0]) * 1.3))
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
