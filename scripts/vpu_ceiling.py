"""Microbench: sustained VPU fp32 FMA ceiling on the current chip.

Each grid step streams a distinct [rows, 1024] VMEM block and runs
NCHAIN independent data-dependent fma chains of length LEN on it.
Reported Gflop/s counts fma = 2 flops. The plateau over the sweep is
the chip's usable VPU ceiling for pair-kernel math.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NCELL = 4096
W = 1024


def make(rows: int, nchain: int, length: int):
    def kernel(jref, oref):
        base = jref[...]
        accs = [base * (1.0 + 0.1 * c) for c in range(nchain)]
        for _ in range(length):
            for c in range(nchain):
                # non-affine (acc enters both fma operands): the compiler
                # cannot fold the chain into one affine map
                accs[c] = accs[c] * accs[c] * 1e-6 + base
        out = accs[0]
        for c in range(1, nchain):
            out = out + accs[c]
        oref[...] = out

    call = pl.pallas_call(
        kernel,
        grid=(NCELL,),
        in_specs=[pl.BlockSpec((rows, W), lambda c: (c, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, W), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NCELL * rows, W), jnp.float32),
    )
    return jax.jit(lambda x: call(x))


def timeit(name, fn, x, flops, reps=10):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    jax.block_until_ready(out)
    s = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {s * 1e3:8.2f} ms   {flops / s / 1e9:8.0f} Gflop/s")


def main():
    for rows in (8, 16, 32):
        x = jnp.ones((NCELL * rows, W), jnp.float32)
        for nchain in (1, 2, 4, 8):
            length = 256 // nchain
            flops = NCELL * rows * W * nchain * length * 2
            timeit(f"rows={rows} chains={nchain}", make(rows, nchain, length),
                   x, flops)


if __name__ == "__main__":
    main()
