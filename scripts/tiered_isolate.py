"""Bisect the tiered-engine TPU worker crash (queue3 2026-08-19:
evrard-50 resident/rebuild benches both kill the worker inside a jitted
run; the eager driver survived to its first fold). Ladder of runs from
small to the failing config, each printing PASS before the next starts,
so the log pinpoints the first faulting rung:

  1. side 30, multi-tier (cap_max forced low), EAGER, gravity OFF
  2. same, gravity FMM
  3. same, scan k=8 jit
  4. side 50 production tiers, eager, gravity FMM
  5. side 50, scan k=8 (the crashing bench shape)
  6. side 50 RESIDENT, scan k=8

Usage: python scripts/tiered_isolate.py [max_rung=6]
"""

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

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.evrard import init_evrard
from sphexa_tpu.propagator.ve_tiered import (choose_tiers_auto,
                                             make_ve_step_pallas_tiered,
                                             make_ve_step_pallas_tiered_resident)


def tiers_for(state, box, cap_max):
    p = state.p
    alive = np.asarray(p.alive)
    return choose_tiers_auto(box, p.x, p.y, p.z, p.h, alive=alive,
                             cap_max=cap_max, verbose=True)


def eager(step1, state, k, label):
    st = state
    for i in range(k):
        st, d = step1(st)
        mcc = int(np.asarray(d.max_cell_count))
        print(f"#   {label} step {i}: t={float(st.ttot):.4g} fold={mcc}",
              flush=True)
        assert mcc == 0, f"{label}: fold at step {i}"
    return st


def scanned(step1, state, k, label, leaf=lambda s: s.p.x):
    def body(s, _):
        s2, d = step1(s)
        return s2, d.max_cell_count

    run = jax.jit(lambda s: jax.lax.scan(body, s, None, length=k))
    st, mcc = run(state)
    _ = float(leaf(st)[0])
    print(f"#   {label}: scan({k}) ok, folds="
          f"{np.asarray(mcc).tolist()}", flush=True)
    assert int(np.asarray(mcc)[-1]) == 0, f"{label}: fold in scan"
    return st


def main():
    max_rung = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    interp = jax.devices()[0].platform != "tpu"
    t0 = time.perf_counter()

    def clock(msg):
        print(f"# [{time.perf_counter() - t0:.0f}s] {msg}", flush=True)

    cfg0 = SphConfig()

    # rungs 1-3: side 30, multi-tier, small compiles
    state, box, cfg = init_evrard(30, cfg0, dt0=3e-5)
    tiers = tiers_for(state, box, cap_max=128)
    clock(f"rung 1: side 30 tiers={[(t.grid.n, t.grid.cap) for t in tiers]} "
          f"gravity OFF eager")
    cfg_ng = cfg.replace(gravG=0.0)
    step_ng = make_ve_step_pallas_tiered(box, tiers, cfg_ng,
                                         interpret=interp)
    eager(step_ng, state, 4, "r1")
    clock("rung 1 PASS")
    if max_rung < 2:
        return

    clock("rung 2: side 30 gravity FMM eager")
    cfg_g = cfg.replace(gravG=1.0, gravity_solver="fmm")
    step_g = make_ve_step_pallas_tiered(box, tiers, cfg_g, interpret=interp)
    eager(step_g, state, 4, "r2")
    clock("rung 2 PASS")
    if max_rung < 3:
        return

    clock("rung 3: side 30 scan(8) jit")
    scanned(step_g, state, 8, "r3")
    clock("rung 3 PASS")
    if max_rung < 4:
        return

    # rungs 4-6: the failing side-50 config
    state, box, cfg = init_evrard(50, cfg0, dt0=3e-5)
    cfg = cfg.replace(gravity_solver="fmm")
    tiers = tiers_for(state, box, cap_max=128)
    clock(f"rung 4: side 50 tiers="
          f"{[(t.grid.n, t.grid.cap) for t in tiers]} eager")
    step1 = make_ve_step_pallas_tiered(box, tiers, cfg, interpret=interp)
    state4 = eager(step1, state, 4, "r4")
    clock("rung 4 PASS")
    if max_rung < 5:
        return

    clock("rung 5: side 50 scan(8) jit (the crashing bench shape)")
    scanned(step1, state, 8, "r5")
    clock("rung 5 PASS")
    if max_rung < 6:
        return

    clock("rung 6: side 50 RESIDENT scan(8)")
    bind, rstep = make_ve_step_pallas_tiered_resident(box, tiers, cfg,
                                                      interpret=interp)
    carry = bind(state)

    def body(c, _):
        c2, d = rstep(c)
        return c2, d.max_cell_count

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=8))
    carry, mcc = run(carry)
    _ = float(carry.state.p.x[0])
    print(f"#   r6: resident scan(8) ok, folds={np.asarray(mcc).tolist()}",
          flush=True)
    clock("rung 6 PASS — no crash reproduced")


if __name__ == "__main__":
    main()
