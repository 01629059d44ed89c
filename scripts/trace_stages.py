"""Ground-truth per-kernel device times via a jax profiler trace.

Host-side timing through the remote-device tunnel is unreliable
(block_until_ready can return before execution completes), so this
traces N steps of the resident Pallas engine and reads the per-kernel
durations from the device plane of the xplane proto.

Usage: python scripts/trace_stages.py [side] [cap] [steps]
"""

from __future__ import annotations

import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def parse_xplane(path):
    """Sum device-plane event durations by kernel name."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    totals = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        print(f"plane: {plane.name}  lines: "
              f"{[(l.name, len(l.events)) for l in plane.lines]}")
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9   # -> ms
                counts[name] += 1
    return totals, counts


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from sphexa_tpu.config import SphConfig
    from sphexa_tpu.init.sedov import init_sedov
    from sphexa_tpu.ops.cellmajor import choose_cm_grid
    from sphexa_tpu.propagator.ve_pallas import ResidentVE

    n = side ** 3
    state, box, cfg = init_sedov(side, SphConfig(), dt0=1e-4)
    grid = choose_cm_grid(box, float(state.p.h[0]) * 1.2, n, cap=cap)
    print(f"n={n} grid={grid} occ={n / (grid.n ** 2 * grid.nz):.1f}")
    eng = ResidentVE(box, grid, cfg)
    rst = eng.bind(state)
    for _ in range(2):   # warmup/compile
        rst, diag = eng.step(rst)
    _ = float(diag.dt)

    tdir = "/tmp/sphexa_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(steps):
            rst, diag = eng.step(rst)
        _ = float(diag.dt)   # force completion inside the trace

    paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {tdir}"
    totals, counts = parse_xplane(paths[0])
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"\n{'kernel':58s} {'ms/step':>9s} {'calls':>6s}")
    other = 0.0
    total = 0.0
    for name, ms in rows:
        total += ms / steps
        if ms / steps < 0.5:
            other += ms / steps
            continue
        print(f"{name[:58]:58s} {ms / steps:9.2f} {counts[name]:6d}")
    print(f"{'(everything <0.5ms/step)':58s} {other:9.2f}")
    print(f"{'TOTAL device':58s} {total:9.2f}")


if __name__ == "__main__":
    main()
