"""Debug the tiered Evrard failures on TPU (queue 2026-08-19):
jobs 2/3 crashed the worker inside an 8-step scan (1-step scans fine);
job 4 (tiered-BDT) fail-stopped with nonzero fold after 2 warm steps.

This driver steps EAGERLY with a readback + full diag check after every
step; when the folded fail-stop counter goes nonzero it re-runs the
forces on the pre-step state and prints the DECOMPOSED counter
[overflow, unowned, missed, clamped] to say which invariant broke.

Usage: python scripts/tiered_debug.py [side=50] [steps=12]
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
from sphexa_tpu.propagator.ve_tiered import (_build_layouts, _tier_engines,
                                             _tiered_forces, audit_tiers,
                                             choose_tiers,
                                             make_ve_step_pallas_tiered)


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    cfg = SphConfig()
    state, box, cfg = init_evrard(side, cfg, dt0=3e-5)
    cfg = cfg.replace(gravity_solver="fmm")
    p = state.p
    alive = np.asarray(p.alive)
    tiers = choose_tiers(box, p.x, p.y, p.z, p.h, alive=alive, cap_max=128)
    assert audit_tiers(tiers, box, p.x, p.y, p.z, p.h, alive=alive) == 0
    print(f"# tiers: {[(t.grid.n, t.grid.cap) for t in tiers]}", flush=True)

    interp = jax.devices()[0].platform != "tpu"
    step1 = make_ve_step_pallas_tiered(box, tiers, cfg, interpret=interp)
    engines = _tier_engines(tiers, cfg, interpret=interp)

    @jax.jit
    def parts_of(st):
        layouts = _build_layouts(engines, box, st.p)
        fo = _tiered_forces(st.p, st.dt, layouts, engines, box, cfg)
        return fo["fold_parts"]

    st = state
    t0 = time.perf_counter()
    for i in range(steps):
        prev = st
        st, d = step1(st)
        mcc = int(np.asarray(d.max_cell_count))
        x0 = float(np.asarray(st.p.x)[0])
        print(f"# step {i}: t={float(st.ttot):.5g} dt={float(d.dt):.3e} "
              f"etot={float(d.etot):.6g} fold={mcc} x0={x0:.4f} "
              f"wall={time.perf_counter() - t0:.0f}s", flush=True)
        assert np.isfinite(float(d.etot)), "non-finite energy"
        if mcc != 0:
            parts = np.asarray(parts_of(prev)).tolist()
            print(f"# FOLD at step {i}: [overflow, unowned, missed, "
                  f"clamped] = {parts}", flush=True)
            break
    else:
        print("# eager stepping survived — crash is scan-specific",
              flush=True)


if __name__ == "__main__":
    main()
