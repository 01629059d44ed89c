"""Workaround probes for the second-combined-program TPU failure.

Measured matrix on the v5e (queue4/5/6 logs, 2026-08-19):
  - N Pallas-only programs: fine (sedov bench, ladder rung 1)
  - N FMM-only programs: fine (fmm_crash_probe stages A/B)
  - Pallas+FMM combined, FIRST program: fine (2+ calls)
  - Pallas+FMM combined, SECOND program: INVALID_ARGUMENT / worker
    crash at its 1st-2nd call — the TPU incarnation of the DESIGN.md
    'Known test-backend pitfall'.

Two candidate workarounds, probed in order:

  D1 SPLIT: keep Pallas stages and the FMM in SEPARATE programs,
     python-composed per step (costs one extra dispatch, no extra HBM
     traffic). Probes two generations of each to mirror the re-tier /
     re-grid lifecycle.
  D2 EXPLICIT ARGS: one combined program but the M2L unit tensor and
     parity masks enter as REAL jit arguments instead of hoisted
     constvars.

Usage: python scripts/fmm_split_probe.py [side=24]
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
from sphexa_tpu.gravity.fmm import (FmmConfig, _unit_kernel_device,
                                    fmm_gravity)
from sphexa_tpu.init.evrard import init_evrard
from sphexa_tpu.ops.cellmajor import (build_layout, choose_cap_and_grid,
                                      to_cm)
from sphexa_tpu.ops.pallas_ve import PallasVE


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    cfg = SphConfig()
    state, box, cfg = init_evrard(side, cfg, dt0=3e-5)
    p = state.p
    fc = FmmConfig(level=4, min_sep=3)
    t0 = time.perf_counter()

    alive_np = np.asarray(p.alive)
    cap, grid = choose_cap_and_grid(
        box, float(np.asarray(p.h)[alive_np].max()) * 1.25,
        int(alive_np.sum()), np.asarray(p.x)[alive_np],
        np.asarray(p.y)[alive_np], np.asarray(p.z)[alive_np])
    interp = jax.devices()[0].platform != "tpu"
    pve = PallasVE(grid, cfg, interpret=interp)
    print(f"# grid: cap={cap} {grid}", flush=True)

    def make_pallas(shift):
        @jax.jit
        def f(x, y, z, m, alive):
            layout = build_layout(grid, box, x + shift, y, z, alive=alive)
            base = pve.base_rows(layout, x + shift, y, z, p.h)
            xm, _h, _nc, _ = pve.xmass_h(base, to_cm(layout, m))
            return jnp.sum(jnp.where(layout.valid, xm, 0.0))
        return f

    def make_fmm(shift):
        @jax.jit
        def f(x, y, z, m, alive):
            g = fmm_gravity(x + shift, y, z, m, alive, box, 1.0, fc,
                            eps=0.05)
            return g.ax.sum() + g.ay.sum()
        return f

    # ---- D1: split programs, python-composed; two generations ----
    for gen in range(2):
        fp = make_pallas(gen * 1e-7)
        fg = make_fmm(gen * 1e-7)
        for call in range(4):
            a = float(fp(p.x, p.y, p.z, p.m, p.alive))
            b = float(fg(p.x, p.y, p.z, p.m, p.alive))
            print(f"# D1 gen {gen} call {call}: sph={a:.5e} g={b:.5e} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)
            assert np.isfinite(a) and np.isfinite(b)
    print("# D1 (split programs) PASS", flush=True)

    # ---- D2: combined program, unit tensor as explicit args ----
    unit, pmasks = _unit_kernel_device(fc.min_sep)
    pkeys = sorted(pmasks.keys())
    masks_list = [pmasks[k] for k in pkeys]

    def make_combined_args(shift):
        @jax.jit
        def f(x, y, z, m, alive, unit_arg, *mask_args):
            # rebind the device cache to the ARGUMENT values for this
            # trace: fmm_gravity reads the process cache, so stuff the
            # tracers in and restore after (trace-time only)
            from sphexa_tpu.gravity import fmm as _fmm
            saved = _fmm._M2L_DEVICE_CACHE.get(int(fc.min_sep))
            _fmm._M2L_DEVICE_CACHE[int(fc.min_sep)] = (
                unit_arg, dict(zip(pkeys, mask_args)))
            try:
                layout = build_layout(grid, box, x + shift, y, z,
                                      alive=alive)
                base = pve.base_rows(layout, x + shift, y, z, p.h)
                xm, _h, _nc, _ = pve.xmass_h(base, to_cm(layout, m))
                g = fmm_gravity(x + shift, y, z, m, alive, box, 1.0,
                                fc, eps=0.05)
            finally:
                _fmm._M2L_DEVICE_CACHE[int(fc.min_sep)] = saved
            return (jnp.sum(jnp.where(layout.valid, xm, 0.0))
                    + g.ax.sum() + g.ay.sum())
        return f

    for gen in range(2):
        f = make_combined_args(gen * 1e-7)
        for call in range(4):
            v = float(f(p.x, p.y, p.z, p.m, p.alive, unit, *masks_list))
            print(f"# D2 gen {gen} call {call}: {v:.5e} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)
            assert np.isfinite(v)
    print("fmm_split_probe: PASS — D1 and D2 both survived", flush=True)


if __name__ == "__main__":
    main()
