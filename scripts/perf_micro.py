"""Primitive micro-benchmarks (the reference's perf-harness tier:
domain/test/performance/{hilbert,octree,neighbor_driver,scan}, tracked
by ReFrame CI, .jenkins/reframe_ci.py:50-110). One JSON line per
primitive: {"primitive", "n", "items_per_sec", "platform"}.

Usage: python scripts/perf_micro.py [n=262144]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import os
import jax

# CPU-forcing for verification runs (JAX_PLATFORMS is ignored once the
# axon TPU plugin registers; the config override is authoritative)
_plat = os.environ.get("SPHEXA_PLATFORM")
if _plat:
    os.environ.pop("JAX_PLATFORMS", None)
    jax.config.update("jax_platforms", _plat)
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])[..., 0]  # forced readback
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    plat = jax.devices()[0].platform
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n), jnp.float32)
    y = jnp.asarray(rng.rand(n), jnp.float32)
    z = jnp.asarray(rng.rand(n), jnp.float32)

    def emit(name, dt, items=n):
        print(json.dumps({"primitive": name, "n": items,
                          "items_per_sec": items / max(dt, 1e-12),
                          "platform": plat}))

    # --- Hilbert encode (performance/hilbert.cpp analog) ---
    from sphexa_tpu.sfc.box import Box, Boundary
    from sphexa_tpu.domain.hilbert import hilbert_keys
    box = Box.cube(0.0, 1.0, Boundary.periodic)
    enc = jax.jit(lambda a, b, c: hilbert_keys(box, a, b, c))
    emit("hilbert30_encode", timeit(enc, x, y, z))

    from sphexa_tpu.sfc.hilbert64 import keys64_from_positions
    enc64 = jax.jit(lambda a, b, c: keys64_from_positions(box, a, b, c))
    emit("hilbert64_encode", timeit(enc64, x, y, z))

    # --- radix sort by key (performance/scan.cpp neighborhood) ---
    keys = enc(x, y, z)
    srt = jax.jit(lambda k: jnp.sort(k))
    emit("key_sort", timeit(srt, keys))

    # --- cell-major layout build (performance/octree.cpp analog:
    #     the from-scratch spatial-structure build) ---
    from sphexa_tpu.ops.cellmajor import CMGrid, build_layout
    grid = CMGrid(n=16, cap=128)
    alive = jnp.ones((n,), bool)
    bl = jax.jit(lambda a, b, c: build_layout(grid, box, a, b, c,
                                              alive=alive))
    emit("cm_layout_build", timeit(bl, x, y, z))

    # --- fixed-k neighbor list (performance/neighbor_driver.cu analog).
    #     Run at a gather-feasible size: the [N, 27*cell_cap] candidate
    #     pad at n=262k/cap=1024 is 29 GB (device OOM, queue4
    #     2026-08-19); 64k particles on a level-5 grid pads ~0.9 GB. ---
    from sphexa_tpu.config import SphConfig
    from sphexa_tpu.neighbors import (CellGrid, build_cell_list,
                                      build_neighbor_list)
    n_nl = min(n, 65536)
    xs, ys, zs = x[:n_nl], y[:n_nl], z[:n_nl]
    alive_nl = jnp.ones((n_nl,), bool)
    cfg = SphConfig(chunk=512, cell_cap=128, ngpad=128)
    h = jnp.full((n_nl,), 0.02, jnp.float32)
    cg = CellGrid(level=5)

    def nl(a, b, c, hh):
        cl = build_cell_list(cg, box, a, b, c, alive=alive_nl)
        return build_neighbor_list(cg, box, cl, a, b, c, hh, cfg,
                                   adapt_h=False, alive=alive_nl).nc
    emit("neighbor_list", timeit(jax.jit(nl), xs, ys, zs, h),
         items=n_nl)

    # --- full FMM solve: P2M + M2M + conv-M2L + L2L + near field
    #     (ryoanji traversal timing analog) ---
    from sphexa_tpu.gravity.fmm import FmmConfig, fmm_gravity
    m = jnp.full((n,), 1.0 / n, jnp.float32)
    fc = FmmConfig(level=4, leaf_cap=max(192, 3 * n // 4096))
    solve = jax.jit(lambda a, b, c, mm: fmm_gravity(
        a, b, c, mm, alive, box, 1.0, fc, eps=0.02))
    try:
        emit("fmm_solve_l4", timeit(solve, x, y, z, m))
    except Exception as e:  # signature drift guard: report, don't die
        print(json.dumps({"primitive": "fmm_solve_l4",
                          "error": str(e)[:160]}))


if __name__ == "__main__":
    main()
