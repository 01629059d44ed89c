"""Per-kernel wall times for the Pallas VE engine on the current device.

Usage: python scripts/profile_stages.py [side] [cap]
Prints per-stage ms at side^3 particles, plus layout/bind costs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.ops.cellmajor import build_layout, choose_cm_grid, to_cm
from sphexa_tpu.ops.pallas_ve import PallasVE
from sphexa_tpu.propagator.ve_pallas import ResidentVE, _Refreshers


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:14s} {ms:8.2f} ms")
    return out


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n = side ** 3
    state, box, cfg = init_sedov(side, SphConfig(), dt0=1e-4)
    if len(sys.argv) > 3 and sys.argv[3] == "direct":
        cfg = cfg.replace(mxu_moments=False)
    if len(sys.argv) > 3 and sys.argv[3] == "momdirect":
        cfg = cfg.replace(mxu_momentum=False)
    grid = choose_cm_grid(box, float(state.p.h[0]) * 1.2, n, cap=cap)
    print(f"n={n} grid={grid} occ={n / grid.n ** 3:.1f} "
          f"slots={grid.n_slots / 1e6:.2f}M")

    pve = PallasVE(grid, cfg)
    rf = _Refreshers(grid, box, False)
    ps = state.p

    layout = timeit("build_layout", jax.jit(
        lambda x, y, z: build_layout(grid, box, x, y, z)), ps.x, ps.y, ps.z)
    base = [to_cm(layout, f) for f in (ps.x, ps.y, ps.z)]
    base = jax.jit(lambda l, x, y, z, h: pve.base_rows(l, x, y, z, h))(
        layout, ps.x, ps.y, ps.z, ps.h)
    cm = lambda f: to_cm(layout, f)
    m, vx, vy, vz, temp, alpha = (cm(f) for f in (
        ps.m, ps.vx, ps.vy, ps.vz, ps.temp, ps.alpha))
    timeit("materialize6", jax.jit(lambda: [to_cm(layout, f) for f in (
        ps.m, ps.vx, ps.vy, ps.vz, ps.temp, ps.alpha)]))

    xh = timeit("xmass_h", jax.jit(lambda b, mm: pve.xmass_h(b, mm)),
                base, m)
    xm, h, nc = xh
    st = rf(2)(jnp.stack([xm, h]))
    xm, h = st[0], st[1]
    base = [base[0], base[1], base[2], h, base[4]]
    timeit("refresh2", jax.jit(lambda a, b: rf(2)(jnp.stack([a, b]))), xm, h)

    kg = timeit("gradh", jax.jit(lambda b, a1, a2: pve.gradh(b, a1, a2)),
                base, m, xm)
    kx, gradh = rf(2)(jnp.stack([kg[0], kg[1]]))
    from sphexa_tpu.sph.eos import eos_ve
    rho, p, c, prho = eos_ve(temp, m, kx, xm, gradh, cfg.mui, cfg.gamma)

    iad = timeit("iad_divv", jax.jit(
        lambda b, a1, a2, a3, a4, a5: pve.iad_divv(b, a1, a2, a3, a4, a5)),
        base, kx, xm, vx, vy, vz)
    cij, divv, curlv, gradv = iad
    st = rf(8)(jnp.stack(list(cij) + [divv, curlv]))
    cij = tuple(st[i] for i in range(6))
    divv = st[6]

    timeit("av", jax.jit(
        lambda b, *a: pve.av_switches(b, *a)),
        base, c, kx, xm, divv, vx, vy, vz, cij, alpha, state.dt)
    timeit("momentum", jax.jit(
        lambda b, *a: pve.momentum(b, *a)),
        base, vx, vy, vz, c, prho, rho, xm, alpha, m, cij)

    # eng.step donates its argument: time by chaining states
    eng = ResidentVE(box, grid, cfg)
    rst = eng.bind(state)
    rst, _ = eng.step(rst)
    jax.block_until_ready(rst)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        rst, _ = eng.step(rst)
    jax.block_until_ready(rst)
    print(f"{'full_step':14s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
    rebin = jax.jit(eng._rebin, donate_argnums=0)
    rst2 = rebin(rst)
    jax.block_until_ready(rst2)
    t0 = time.perf_counter()
    rst2 = rebin(rst2)
    jax.block_until_ready(rst2)
    print(f"{'rebin':14s} {(time.perf_counter() - t0) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
