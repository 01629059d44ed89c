"""Minimal TPU repro/validation for the two-big-constant-programs
failure (DESIGN.md 'Known test-backend pitfall'; reproduced on the v5e
by the tiered isolation ladder 2026-08-19: the 2nd call of the 2nd
program tracing the conv-FMM dies with INVALID_ARGUMENT / a worker
crash).

Drives the EXACT failing shape without the tiered machinery: two
jitted programs that both trace fmm_gravity (17 MB/level M2L conv
constants), each called 4 times. With the shared device-array kernel
cache (_M2L_DEVICE_CACHE) both should survive; the pre-fix behavior
died at program 2, call 2.

Usage: python scripts/fmm_crash_probe.py [side=24]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax

_plat = os.environ.get("SPHEXA_PLATFORM")
if _plat:
    os.environ.pop("JAX_PLATFORMS", None)
    jax.config.update("jax_platforms", _plat)

import jax.numpy as jnp
import numpy as np

from sphexa_tpu.config import SphConfig
from sphexa_tpu.gravity.fmm import FmmConfig, fmm_gravity
from sphexa_tpu.init.evrard import init_evrard


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    cfg = SphConfig()
    state, box, cfg = init_evrard(side, cfg, dt0=3e-5)
    p = state.p
    fc = FmmConfig(level=4, min_sep=3)
    t0 = time.perf_counter()

    def make(shift):
        """Distinct programs: a position shift changes the traced
        graph's constants arrangement enough to force a second
        executable (and a second round of constant hoisting)."""
        @jax.jit
        def f(x, y, z, m, alive):
            g = fmm_gravity(x + shift, y, z, m, alive, box, 1.0, fc,
                            eps=0.05)
            return g.ax.sum() + g.ay.sum() + g.az.sum()
        return f

    # stage A: conv-only (two programs running just the far-field M2L
    # conv stack on synthetic moments — no P2P, no binning, no Pallas).
    # If THIS crashes, the 11^3 conv_general_dilated itself is the
    # trigger; if it survives and stage B dies, the trigger is in
    # P2P/binning or program composition.
    from sphexa_tpu.gravity.fmm import _far_field
    from sphexa_tpu.sfc.box import Box as _Box

    s = 1 << fc.level
    rng = np.random.RandomState(0)
    mom0 = jnp.asarray(rng.randn(20, s, s, s).astype(np.float32))

    def make_conv(scale):
        @jax.jit
        def f(mom):
            loc = _far_field(mom * scale, box, fc)
            return sum(jnp.sum(v) for v in jax.tree.leaves(loc))
        return f

    for pi, f in enumerate([make_conv(1.0), make_conv(1.0 + 1e-7)]):
        for call in range(4):
            v = float(f(mom0))
            print(f"# conv prog {pi} call {call}: {v:.6e} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)
            assert np.isfinite(v)
    print("# stage A (conv-only) PASS", flush=True)

    # stage B: the full solver, two programs x 4 calls
    progs = [make(0.0), make(1e-7)]
    for pi, f in enumerate(progs):
        for call in range(4):
            v = float(f(p.x, p.y, p.z, p.m, p.alive))
            print(f"# prog {pi} call {call}: {v:.6e} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)
            assert np.isfinite(v)
    print("# stage B (fmm solver alone) PASS", flush=True)

    # stage C: ONE Pallas pair kernel + the FMM in a single program —
    # the exact composition that dies on the v5e at its SECOND call
    # (tiered+FMM rung 2; evrard benches) while stages A/B and the
    # tiered engine alone all pass.
    from sphexa_tpu.ops.cellmajor import build_layout, choose_cap_and_grid, to_cm
    from sphexa_tpu.ops.pallas_ve import PallasVE

    alive_np = np.asarray(p.alive)
    cap, grid = choose_cap_and_grid(
        box, float(np.asarray(p.h)[alive_np].max()) * 1.25,
        int(alive_np.sum()), np.asarray(p.x)[alive_np],
        np.asarray(p.y)[alive_np], np.asarray(p.z)[alive_np])
    print(f"# stage C grid: cap={cap} {grid}", flush=True)
    interp = jax.devices()[0].platform != "tpu"
    pve = PallasVE(grid, cfg, interpret=interp)

    def make_combined(shift):
        @jax.jit
        def f(x, y, z, m, alive):
            layout = build_layout(grid, box, x + shift, y, z, alive=alive)
            base = pve.base_rows(layout, x + shift, y, z, p.h)
            xm, h_new, nc, _ = pve.xmass_h(base, to_cm(layout, m))
            g = fmm_gravity(x + shift, y, z, m, alive, box, 1.0, fc,
                            eps=0.05)
            # mask invalid slots: xmass over FILL_POS ghost fills is
            # garbage by design (the engines mask it the same way)
            return (jnp.sum(jnp.where(layout.valid, xm, 0.0))
                    + g.ax.sum() + g.ay.sum())
        return f

    for pi, f in enumerate([make_combined(0.0), make_combined(1e-7)]):
        for call in range(4):
            v = float(f(p.x, p.y, p.z, p.m, p.alive))
            print(f"# combined prog {pi} call {call}: {v:.6e} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)
            assert np.isfinite(v)
    print("fmm_crash_probe: PASS — all stages survived", flush=True)


if __name__ == "__main__":
    main()
