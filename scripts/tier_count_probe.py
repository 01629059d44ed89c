"""Tier-count bisect probe for the v5e tiered-engine InvalidArgument
(queue11/16/18, 2026-08-20): every plan observed to die at runtime had
1 or 2 tiers ([(25,128)] single, [(8,128),(8,128)] double), while
every working plan had 3-4. Run one plan per process:

    python scripts/tier_count_probe.py <max_tiers> [side]

Forces a plan with up to <max_tiers> tiers via the ladder's max_tiers
knob (1 collapses to the uniform-grid tier), steps twice, prints
PROBE ... OK / dies.
"""

from __future__ import annotations

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
    max_tiers = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    from sphexa_tpu.config import SphConfig
    from sphexa_tpu.init.evrard import init_evrard
    from sphexa_tpu.propagator.ve_tiered import (
        choose_tiers_robust, make_ve_step_pallas_tiered)

    cfg = SphConfig(clamp_frac_budget=0.5)   # never fold on clamps here
    state, box, cfg = init_evrard(side, cfg, dt0=3e-5)
    cfg = cfg.replace(gravG=0.0, clamp_frac_budget=0.5)
    p = state.p
    alive = np.asarray(p.alive)
    interp = jax.devices()[0].platform != "tpu"

    tiers, clip = choose_tiers_robust(box, p.x, p.y, p.z, p.h,
                                      alive=alive, cap_max=128,
                                      cap_max_top=128,
                                      max_tiers=max_tiers)
    assert tiers is not None, f"no plan at max_tiers={max_tiers}"
    if clip is not None:
        import jax.numpy as jnp
        cfg = cfg.replace(h_cap=float(clip))
        state = state.replace(p=state.p.replace(
            h=jnp.minimum(state.p.h, clip)))
    print(f"# plan: {[(t.grid.n, t.grid.cap) for t in tiers]} "
          f"clip={clip}", flush=True)
    step = make_ve_step_pallas_tiered(box, tiers, cfg, interpret=interp)
    s = state
    for i in range(2):
        s, d = step(s)
        print(f"# step {i}: t={float(s.ttot):.6f} "
              f"fold={int(d.max_cell_count)}", flush=True)
    print(f"PROBE max_tiers={max_tiers} ({len(tiers)} tiers): OK")


if __name__ == "__main__":
    main()
