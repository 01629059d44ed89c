"""DMA-issue-cost lab for the dynamic-window engine design.

The candidate round-3 engine replaces the static par4 j-windows
(9 offsets x 4*CAP lanes/cell) with per-half-cell [F, 128] windows
DMA'd from *dynamic lane offsets* (z-sorted slots + per-(chunk,offset)
start table). That halves streamed lanes, but each Pallas program then
issues ~9 small strided DMAs per 32-lane i-chunk instead of riding the
auto-pipelined BlockSpec streams. Whether the win survives depends on
the per-DMA issue cost on the v5e, which this lab measures:

  variant "many":  K dynamic [F,128] copies per program, then a light
                   compute pass over each window (the engine shape)
  variant "few":   same bytes as ONE [F, K*128] contiguous copy
  variant "pipe":  the same windows as auto-pipelined BlockSpec streams
                   at static offsets (current-engine baseline shape)

Usage: python scripts/dma_lab.py [K] [F] [programs] [flops_per_lane]
Device times parsed from an xplane trace (host timers are unreliable
through the tunnel, see ROADMAP).
"""

from __future__ import annotations

import collections
import functools
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def device_ms(tdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    totals = collections.defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                if "custom-call" in name or "fusion" in name:
                    totals[name] += ev.duration_ps / 1e9
    return totals


def make_many(K, F, NS, nprog, reps):
    """K dynamic [F,128] DMAs per program + light compute per window."""

    def kernel(starts_ref, src_ref, o_ref, scratch, sems):
        pid = pl.program_id(0)

        def issue(k):
            s = starts_ref[pid, k]
            return pltpu.make_async_copy(
                src_ref.at[:, pl.ds(s, 128)], scratch.at[k], sems.at[k])

        for k in range(K):
            issue(k).start()
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(K):
            issue(k).wait()
            w = scratch[k]
            # ~3F flops/lane of window compute (stand-in for a stage body)
            acc = acc + w[:8] * w[8:16] + w[:8] * 1.5 + w[8:16] * 0.5
        o_ref[...] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda c, s: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, F, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )

    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nprog * 8, 128), jnp.float32),
    )

    @jax.jit
    def run(src, starts):
        out = 0.0
        for _ in range(reps):
            out = out + call(starts, src)
        return out

    return run


def make_few(K, F, NS, nprog, reps):
    """Same bytes as one contiguous [F, K*128] DMA per program."""
    W = K * 128

    def kernel(starts_ref, src_ref, o_ref, scratch, sem):
        s = starts_ref[pl.program_id(0), 0]
        cp = pltpu.make_async_copy(
            src_ref.at[:, pl.ds(s, W)], scratch, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(K):
            w = scratch[:, k * 128:(k + 1) * 128]
            acc = acc + w[:8] * w[8:16] + w[:8] * 1.5 + w[8:16] * 0.5
        o_ref[...] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda c, s: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((F, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nprog * 8, 128), jnp.float32),
    )

    @jax.jit
    def run(src, starts):
        out = 0.0
        for _ in range(reps):
            out = out + call(starts, src)
        return out

    return run


def make_pipe(K, F, NS, nprog, reps):
    """Auto-pipelined static BlockSpec streams (current-engine shape)."""

    def kernel(*refs):
        o_ref = refs[-1]
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(K):
            w = refs[k][...]
            acc = acc + w[:8] * w[8:16] + w[:8] * 1.5 + w[8:16] * 0.5
        o_ref[...] = acc

    nsb = NS // 128
    in_specs = [
        pl.BlockSpec((F, 128),
                     functools.partial(
                         lambda c, k=0: (0, (c * 7 + k * 13) % (nsb - 1)),
                         k=k),
                     memory_space=pltpu.VMEM)
        for k in range(K)
    ]
    call = pl.pallas_call(
        kernel, grid=(nprog,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, 128), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nprog * 8, 128), jnp.float32),
    )

    @jax.jit
    def run(src, starts):
        out = 0.0
        for _ in range(reps):
            out = out + call(*([src] * K))
        return out

    return run


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    nprog = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    reps = 4
    NS = 1 << 21  # 2M lanes source

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((F, NS)), jnp.float32)
    starts = jnp.asarray(
        rng.integers(0, NS - 130 * K, (nprog, 128)), jnp.int32)

    for name, mk in (("many", make_many), ("few", make_few),
                     ("pipe", make_pipe)):
        run = mk(K, F, NS, nprog, reps)
        out = run(src, starts)    # compile+warm
        _ = float(out[0, 0])
        tdir = tempfile.mkdtemp(prefix=f"dma_{name}_")
        with jax.profiler.trace(tdir):
            out = run(src, starts)
            _ = float(out[0, 0])
        tot = device_ms(tdir)
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:3]
        per_dma_us = (sum(v for _, v in top) / reps) * 1e3 / (
            nprog * (K if name == "many" else 1))
        print(f"{name:5s} total/rep = "
              f"{sum(v for _, v in top) / reps:8.3f} ms   "
              f"(~{per_dma_us:.3f} us/program-DMA)  top: "
              + ", ".join(f"{k[:40]}={v/reps:.3f}" for k, v in top))


if __name__ == "__main__":
    main()
