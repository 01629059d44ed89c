"""Per-kernel device times from a jax profiler trace.

The TPU analog of the reference's per-substage Timer table
(main/src/util/timer.hpp:30): host timers are unreliable through
remote-device tunnels (block_until_ready can return before execution),
so the ground truth is the device plane of the xplane proto written by
jax.profiler.trace.
"""

from __future__ import annotations

import collections
import glob


def device_op_times(trace_dir: str):
    """Sum XLA-op durations by name over the TPU device plane.

    Returns (totals_ms, counts). Only the synchronous "XLA Ops" line is
    summed — async slice/copy spans overlap compute and would double
    count.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    totals = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_names = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                    if name.startswith("%slice-start") or \
                            name.startswith("%copy-start"):
                        continue   # async spans overlap compute
                    totals[name] += ev.duration_ps / 1e9
                    counts[name] += 1
    return totals, counts


def print_table(trace_dir: str, steps: int = 1, min_ms: float = 0.5,
                out=print):
    """Print a per-kernel ms/step table sorted by cost."""
    totals, counts = device_op_times(trace_dir)
    if not totals:
        out(f"# no TPU device plane found under {trace_dir}")
        return
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    out(f"# {'device op':56s} {'ms/step':>9s} {'calls':>6s}")
    other = 0.0
    total = 0.0
    for name, ms in rows:
        total += ms / steps
        if ms / steps < min_ms:
            other += ms / steps
            continue
        out(f"# {name[:56]:56s} {ms / steps:9.2f} {counts[name]:6d}")
    out(f"# {'(ops below threshold)':56s} {other:9.2f}")
    out(f"# {'TOTAL device (sync ops)':56s} {total:9.2f}")
