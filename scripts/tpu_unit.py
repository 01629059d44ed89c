"""On-chip Pallas kernel parity (the reference's unit_cuda tier analog,
domain/test/unit_cuda/): run the five pair stages on the REAL TPU at a
small size and compare against the XLA gather path — the same
equivalence the CPU suite checks in interpret mode, but through the
actual Mosaic compiler. Prints PASS/FAIL per field; exits nonzero on
failure.

    python scripts/tpu_unit.py [side]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    assert jax.devices()[0].platform == "tpu", "needs the real chip"

    from sphexa_tpu.config import SphConfig
    from sphexa_tpu.init.sedov import init_sedov
    from sphexa_tpu.neighbors import CellGrid, choose_level
    from sphexa_tpu.ops.cellmajor import choose_cap_and_grid
    from sphexa_tpu.propagator.ve import make_ve_step
    from sphexa_tpu.propagator.ve_pallas import make_ve_step_pallas

    cfg = SphConfig(chunk=1024, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(side, cfg, dt0=2e-4)
    alive = np.asarray(state.p.alive)
    h0 = float(np.asarray(state.p.h)[alive].max())

    step_x = make_ve_step(box, CellGrid(choose_level(box, h0 * 1.3)), cfg)
    cap, grid = choose_cap_and_grid(
        box, h0 * 1.3, side ** 3, np.asarray(state.p.x)[alive],
        np.asarray(state.p.y)[alive], np.asarray(state.p.z)[alive])
    step_p = make_ve_step_pallas(box, grid, cfg, interpret=False)

    sx, sp = state, state
    for _ in range(3):
        sx, dx = step_x(sx)
        sp, dp = step_p(sp)
    _ = float(sx.p.x[0]) + float(sp.p.x[0])   # real readback

    ok = True
    for f in ("x", "vx", "temp", "h", "alpha"):
        a = np.asarray(getattr(sx.p, f))
        b = np.asarray(getattr(sp.p, f))
        scale = max(np.abs(a).max(), 1e-12)
        err = np.abs(b - a).max() / scale
        status = "PASS" if err < 2e-3 else "FAIL"
        ok &= err < 2e-3
        print(f"{status} {f:6s} rel err {err:.2e}")
    np.testing.assert_allclose(float(dp.dt), float(dx.dt), rtol=1e-5)
    print(f"PASS dt     {float(dp.dt):.3e}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
