"""Minimal repro + workaround probe for the v5e 'second tiered engine'
poison (queue11/queue16 2026-08-20): building a SECOND
make_ve_step_pallas_tiered program family in one process dies at
execution with a deterministic INVALID_ARGUMENT that poisons the
backend. Variants:

  A: engine1 step -> engine2 step                 (expected: dies)
  B: engine1 step -> jax.clear_caches() -> engine2 step
  C: engine1 step -> del engine1 refs + gc -> engine2 step

Run each variant in its OWN process (the poison kills the backend):
    python scripts/second_engine_probe.py A|B|C
"""

from __future__ import annotations

import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_plat = os.environ.get("SPHEXA_PLATFORM")
if _plat:
    os.environ.pop("JAX_PLATFORMS", None)
    jax.config.update("jax_platforms", _plat)
import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "A"
    from sphexa_tpu.config import SphConfig
    from sphexa_tpu.init.evrard import init_evrard
    from sphexa_tpu.propagator.ve_tiered import (
        make_ve_step_pallas_tiered)

    cfg = SphConfig()
    state, box, cfg = init_evrard(30, cfg, dt0=3e-5)
    cfg = cfg.replace(gravG=0.0)
    p = state.p
    alive = np.asarray(p.alive)
    interp = jax.devices()[0].platform != "tpu"

    from sphexa_tpu.propagator.ve_tiered import choose_tiers_auto
    tiers1 = choose_tiers_auto(box, p.x, p.y, p.z, p.h, alive=alive,
                               cap_max=128, cap_max_top=128)
    step1 = make_ve_step_pallas_tiered(box, tiers1, cfg, interpret=interp)
    s = state
    for _ in range(5):   # drift the field like the real re-tier flow
        s, d = step1(s)
    print(f"# engine1 ok: t={float(s.ttot):.6f} fold={int(d.max_cell_count)}",
          flush=True)

    if variant == "B":
        jax.clear_caches()
        print("# cleared caches", flush=True)
    elif variant == "C":
        del step1
        gc.collect()
        print("# dropped engine1 refs", flush=True)

    # engine 2: SAME tiers, one fold-threshold constant changed —
    # guaranteed-compilable distinct program (isolates the
    # second-program-family effect from plan feasibility)
    cfg2 = cfg.replace(clamp_frac_budget=cfg.clamp_frac_budget + 1e-3)
    step2 = make_ve_step_pallas_tiered(box, tiers1, cfg2, interpret=interp)
    s2, d2 = step2(s)
    print(f"# engine2 ok ({variant}): t={float(s2.ttot):.6f} "
          f"fold={int(d2.max_cell_count)}", flush=True)
    print(f"PROBE {variant}: SECOND ENGINE SURVIVES")


if __name__ == "__main__":
    main()
