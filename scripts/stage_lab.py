"""Single-stage kernel lab: compile ONE pair stage at bench geometry on
synthetic data and read its ground-truth device time from an xplane
trace (host timers through the remote tunnel are unreliable).

Usage: python scripts/stage_lab.py <stage> [side] [cap] [variant]
  stage: xmass | gradh | iad | av | momentum
  variant: passed to SphConfig toggles (e.g. "direct", "mm", "noramp")
"""

from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def device_ms(tdir, steps):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    totals = collections.defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                if "custom-call" in name:
                    totals[name] += ev.duration_ps / 1e9
    return {k: v / steps for k, v in totals.items()}


def main():
    stage = sys.argv[1]
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    variant = sys.argv[4] if len(sys.argv) > 4 else "default"

    from sphexa_tpu.config import SphConfig
    from sphexa_tpu.init.sedov import init_sedov
    from sphexa_tpu.ops.cellmajor import build_layout, choose_cm_grid, to_cm
    from sphexa_tpu.ops.pallas_ve import PallasVE

    n = side ** 3
    cfg = SphConfig()
    if variant == "direct":
        cfg = cfg.replace(mxu_moments=False)
    elif variant == "mm":
        cfg = cfg.replace(mxu_momentum=True)
    elif variant == "umass":
        cfg = cfg.replace(uniform_mass=True)
    zgroup = int(os.environ.get("LAB_ZGROUP", "0"))

    state, box, cfg2 = init_sedov(side, cfg, dt0=1e-4)
    cfg = cfg.replace(**{k: getattr(cfg2, k) for k in ()})  # keep toggles
    grid = choose_cm_grid(box, float(state.p.h[0]) * 1.2, n, cap=cap)
    print(f"n={n} grid={grid} occ={n / (grid.n ** 2 * grid.nz):.1f} "
          f"variant={variant}")

    pve = PallasVE(grid, cfg, zgroup=zgroup)
    ps = state.p
    layout = jax.jit(lambda x, y, z: build_layout(grid, box, x, y, z))(
        ps.x, ps.y, ps.z)
    base = jax.jit(lambda l, x, y, z, h: pve.base_rows(l, x, y, z, h))(
        layout, ps.x, ps.y, ps.z, ps.h)
    cm = lambda f, fill=0.0: to_cm(layout, f, fill)
    m_cm = cm(ps.m)
    v_cm = [cm(f) for f in (ps.vx, ps.vy, ps.vz)]
    ns = grid.n_slots
    key = jax.random.PRNGKey(0)
    rnd = lambda lo, hi: jax.random.uniform(key, (ns,), jnp.float32, lo, hi)

    if stage == "xmass":
        fn = jax.jit(lambda b, m: pve.xmass_h(b, m))
        args = (base, m_cm)
    elif stage == "gradh":
        fn = jax.jit(lambda b, m, xm: pve.gradh(b, m, xm))
        args = (base, m_cm, m_cm * 1.05)
    elif stage == "iad":
        fn = jax.jit(lambda b, kx, xm, vx, vy, vz:
                     pve.iad_divv(b, kx, xm, vx, vy, vz))
        args = (base, rnd(0.5, 1.5), m_cm, *v_cm)
    elif stage == "av":
        cij = tuple(rnd(0.1, 1.0) for _ in range(6))
        fn = jax.jit(lambda b, c, kx, xm, dv, vx, vy, vz, cj, al:
                     pve.av_switches(b, c, kx, xm, dv, vx, vy, vz, cj, al,
                                     1e-4))
        args = (base, rnd(0.5, 2.0), rnd(0.5, 1.5), m_cm, rnd(-1.0, 1.0),
                *v_cm, cij, rnd(0.05, 1.0))
    elif stage == "momentum":
        cij = tuple(rnd(0.1, 1.0) for _ in range(6))
        fn = jax.jit(lambda b, vx, vy, vz, c, pr, rho, xm, al, m, cj:
                     pve.momentum(b, vx, vy, vz, c, pr, rho, xm, al, m, cj))
        args = (base, *v_cm, rnd(0.5, 2.0), rnd(0.1, 1.0), rnd(0.8, 1.2),
                m_cm, rnd(0.05, 1.0), m_cm, cij)
    else:
        raise SystemExit(f"unknown stage {stage}")

    out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])

    steps = 5
    tdir = "/tmp/sphexa_lab"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(steps):
            out = fn(*args)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])

    for name, ms in sorted(device_ms(tdir, steps).items(),
                           key=lambda kv: -kv[1]):
        print(f"{name[:70]:70s} {ms:8.2f} ms/call")


if __name__ == "__main__":
    main()
