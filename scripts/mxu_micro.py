"""Microbench: in-Pallas-kernel matmul cost vs precision on the chip.

Mimics the hybrid-IAD inner structure: per grid step, 9 dots of
[CAP, 3CAP] x [3CAP, K] plus a light VPU load, to find what Mosaic
does with fp32 dots (bf16 1-pass vs 3/6-pass decomposition) and how
well MXU overlaps VPU.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 64
RUNW = 3 * CAP
K = 16
NCELL = 17576  # match Sedov-100^3 interior cells
FJ = 16


def make(mode: str, vpu_flops: int):
    def kernel(jref, oref):
        acc = jnp.zeros((CAP, K), jnp.float32)
        v = jnp.broadcast_to(jref[0:1, :], (CAP, RUNW))
        v = v + jax.lax.broadcasted_iota(
            jnp.int32, (CAP, RUNW), 0).astype(jnp.float32)
        for g in range(9):
            w = v * (1.0 + g)
            for _ in range(vpu_flops):
                w = w * 1.000001 + 0.5
            M = jref[:, :K]  # [FJ*CAP? no: slice K lanes] -> build [RUNW, K]
            M2 = jnp.transpose(jref[0:K, 0:RUNW])
            if mode == "f32":
                acc += jax.lax.dot_general(
                    w[:, 0:RUNW], M2,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif mode == "f32_highest":
                acc += jax.lax.dot_general(
                    w[:, 0:RUNW], M2,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            elif mode == "bf16":
                acc += jax.lax.dot_general(
                    w[:, 0:RUNW].astype(jnp.bfloat16),
                    M2.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif mode == "none":
                acc += w[:, 0:K]
        oref[...] = jnp.concatenate(
            [acc, jnp.zeros((CAP, RUNW - K), jnp.float32)], axis=1)

    call = pl.pallas_call(
        kernel,
        grid=(NCELL,),
        in_specs=[pl.BlockSpec((FJ, RUNW), lambda c: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CAP, RUNW), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CAP, RUNW), jnp.float32),
    )
    return jax.jit(lambda x: call(x))


def timeit(name, fn, x, reps=10):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    cyc = ms * 1e-3 * 0.94e9 / NCELL
    print(f"{name:22s} {ms:8.2f} ms   {cyc:7.0f} cyc/cell")


def main():
    x = jnp.ones((FJ, RUNW), jnp.float32)
    for vf in (0, 30):
        for mode in ("none", "f32", "f32_highest", "bf16"):
            timeit(f"{mode} vpu={vf}", make(mode, vf), x)


if __name__ == "__main__":
    main()
