"""Chipless compile probe for deep-cap Pallas engines under i-row
blocking (pallas_ve.make_cell_pair_call IB sub-blocks).

For each (side, n, cap) geometry this lowers and COMPILES the resident
engine's 20-step scan on the TPU backend — no execution — and reports
pass/fail plus XLA's memory analysis. The hypothesis under test: with
IB=128 the Mosaic kernel stack is ~40 MiB regardless of cap (it was
~0.31 MiB/cap unblocked, capping the engine at <384 on the v5e).

    python scripts/vmem_probe.py [combos]
    combos default: 100,20,256 100,16,384 100,12,640

Run on the TPU queue (compiles are AOT through the tunnel, ~8-25 min
each on a cold cache).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_plat = os.environ.get("SPHEXA_PLATFORM")
if _plat:
    os.environ.pop("JAX_PLATFORMS", None)
    jax.config.update("jax_platforms", _plat)

import numpy as np


def main():
    from sphexa_tpu.config import SphConfig
    from sphexa_tpu.init.sedov import init_sedov
    from sphexa_tpu.ops.cellmajor import CMGrid, legal_zgroup
    from sphexa_tpu.propagator.ve_pallas import ResidentVE

    combos = sys.argv[1:] or ["100,20,256", "100,16,384", "100,12,640"]
    t0 = time.perf_counter()
    results = []
    for combo in combos:
        side, n, cap = (int(v) for v in combo.split(","))
        cfg = SphConfig()
        state, box, cfg = init_sedov(side, cfg, dt0=1e-5)
        grid = CMGrid(n=n, cap=cap)
        zg = legal_zgroup(grid.npz, cap)
        print(f"# probe side={side} n={n} cap={cap} Z={zg} "
              f"iblock={os.environ.get('SPHEXA_IBLOCK', '128')} "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)
        interp = jax.devices()[0].platform != "tpu"
        try:
            eng = ResidentVE(box, grid, cfg, interpret=interp)
            rst = eng.bind(state)
            lowered = jax.jit(lambda r: eng.steps(r, 20)).lower(rst)
            compiled = lowered.compile()
            try:
                ma = compiled.memory_analysis()
                print(f"#   temp={ma.temp_size_in_bytes >> 20}MiB "
                      f"arg={ma.argument_size_in_bytes >> 20}MiB "
                      f"out={ma.output_size_in_bytes >> 20}MiB", flush=True)
            except Exception as e:  # noqa: BLE001 — analysis is best-effort
                print(f"#   (memory_analysis unavailable: {e})", flush=True)
            print(f"# PASS cap={cap} n={n} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)
            results.append((combo, "PASS"))
        except Exception as e:  # noqa: BLE001 — record and continue
            msg = str(e).splitlines()[0][:300]
            print(f"# FAIL cap={cap} n={n}: {msg} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)
            results.append((combo, "FAIL"))
    print("vmem_probe:", " ".join(f"{c}:{r}" for c, r in results),
          flush=True)


if __name__ == "__main__":
    main()
