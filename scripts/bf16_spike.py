"""Decision spike: attacks on the 3.1M-pups pair-lane floor
(VERDICT r4 item 4). Three measurements, one table (DESIGN.md
'Beyond the pair-lane floor'):

  a) bf16-stream MXU momentum: the factored [5CAP,3CAP]x[3CAP,49]
     contraction (_momentum_mm_body) with bf16 operands / fp32
     accumulation vs the fp32 hybrid vs the direct VPU body — full
     resident-step timings plus stage accuracy vs the fp64-ish direct
     body.
  b) XLA dynamic-gather ceiling: the [N, k]-indexed neighbor gather +
     segment reduction pattern (the fixed-k engine's inner loop) timed
     at Sedov-100^3 scale — bounds any gather-based engine on this
     chip (the Pallas engines instead stream 27-stencil windows;
     ROADMAP 'pair-lane floor').
  c) in-kernel dot precision sweep via scripts/mxu_micro.py (run
     separately).

Usage:  python scripts/bf16_spike.py [accuracy|timing|gather|all]
CPU accuracy mode: SPHEXA_PLATFORM=cpu python scripts/bf16_spike.py accuracy
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_plat = os.environ.get("SPHEXA_PLATFORM")
if _plat:
    os.environ.pop("JAX_PLATFORMS", None)
    jax.config.update("jax_platforms", _plat)
import jax.numpy as jnp
import numpy as np


def _sedov_engine(side, cfg):
    from sphexa_tpu.init.sedov import init_sedov
    from sphexa_tpu.ops.cellmajor import choose_cap_and_grid

    state, box, cfg = init_sedov(side, cfg, dt0=1e-5)
    alive = np.asarray(state.p.alive)
    cap, grid = choose_cap_and_grid(
        box, float(np.asarray(state.p.h)[alive].max()) * 1.2, side ** 3,
        np.asarray(state.p.x)[alive], np.asarray(state.p.y)[alive],
        np.asarray(state.p.z)[alive], headroom=8)
    return state, box, cfg, grid


def accuracy(side=10):
    """Momentum-stage outputs: direct VPU body vs fp32-MXU vs bf16-MXU
    on the same evolved snapshot (interpret-safe)."""
    from sphexa_tpu.config import SphConfig
    from sphexa_tpu.propagator.ve_pallas import ResidentVE

    interp = jax.devices()[0].platform != "tpu"
    results = {}
    outs = {}
    for name, kw in (("direct", dict(mxu_momentum=False)),
                     ("mm_f32", dict(mxu_momentum=True)),
                     ("mm_bf16", dict(mxu_momentum=True, mxu_bf16=True))):
        cfg = SphConfig(**kw)
        state, box, cfg, grid = _sedov_engine(side, cfg)
        eng = ResidentVE(box, grid, cfg, interpret=interp)
        rst = eng.bind(state)
        rst, d = eng.steps(rst, 3)   # develop a bit of shock first
        s = eng.unbind(rst, state.p.n)
        outs[name] = {f: np.asarray(getattr(s.p, f))
                      for f in ("vx", "vy", "vz", "temp")}
        results[name] = float(d.etot[-1])
    ref = outs["direct"]
    table = {}
    for name in ("mm_f32", "mm_bf16"):
        errs = {}
        for f, a in ref.items():
            b = outs[name][f]
            scale = np.abs(a).max() + 1e-12
            errs[f] = float(np.abs(b - a).max() / scale)
        table[name] = errs
    print(json.dumps({"spike": "momentum_accuracy", "side": side,
                      "max_rel_err_vs_direct": table,
                      "etot": results}))


def timing(side=100, iters=8):
    """Full resident-step wall time per momentum variant (TPU;
    long-minus-short latency cancellation as in bench.py)."""
    from sphexa_tpu.config import SphConfig
    from sphexa_tpu.propagator.ve_pallas import ResidentVE

    assert jax.devices()[0].platform == "tpu", "timing spike needs the chip"
    rows = {}
    for name, kw in (("direct", dict(mxu_momentum=False)),
                     ("mm_f32", dict(mxu_momentum=True)),
                     ("mm_bf16", dict(mxu_momentum=True, mxu_bf16=True))):
        cfg = SphConfig(**kw)
        state, box, cfg, grid = _sedov_engine(side, cfg)
        eng = ResidentVE(box, grid, cfg)
        rst = eng.bind(state)
        rst, _ = eng.steps(rst, 1)
        _ = float(rst.x[0])
        rst, _ = eng.steps(rst, iters)
        _ = float(rst.x[0])
        t0 = time.perf_counter()
        rst, d = eng.steps(rst, iters)
        _ = float(rst.x[0])
        t_long = time.perf_counter() - t0
        t0 = time.perf_counter()
        rst, _ = eng.steps(rst, 1)
        _ = float(rst.x[0])
        t_short = time.perf_counter() - t0
        per = (t_long - t_short) / (iters - 1)
        rows[name] = dict(step_ms=per * 1e3,
                          pups=side ** 3 / per,
                          ovf=int(d.overflow[-1]))
        print(f"# {name}: {per * 1e3:.1f} ms/step "
              f"({side ** 3 / per / 1e6:.2f}M pups)", flush=True)
    print(json.dumps({"spike": "momentum_timing", "side": side,
                      "rows": rows}))


def gather(n=1_000_000, k=160, reps=20):
    """XLA dynamic-gather ceiling: [N] -> [N, k] row gather + reduce
    for one f32 field, the fixed-k engine's inner data movement.
    5 pair stages x ~8 gathered fields bound that engine's step time;
    compare against the Pallas engines' measured ~320 ms step."""
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(0)
    # clustered-ish neighbor indices (SFC-sorted locality: neighbors
    # within a +-2000 window, like a sorted Sedov frame)
    base = np.arange(n, dtype=np.int32)[:, None]
    off = rng.integers(-2000, 2000, size=(n, k), dtype=np.int32)
    # device argument, NOT a closure capture: a captured index array
    # bakes 640 MB of constants into the program and the tunnel's
    # remote-compile rejects the upload (HTTP 413, queue10 13:49)
    idx = jax.device_put(np.clip(base + off, 0, n - 1))
    field = jax.device_put(rng.random(n, dtype=np.float32))

    @jax.jit
    def one(field, idx):
        g = jnp.take(field, idx, axis=0)          # [n, k] gather
        return jnp.sum(g * g, axis=1)             # pair-style reduce

    r = one(field, idx)
    _ = float(r[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = one(field, idx)
    _ = float(r[0])
    dt = (time.perf_counter() - t0) / reps
    bw = n * k * 4 / dt / 1e9
    print(json.dumps({
        "spike": "xla_gather_ceiling", "n": n, "k": k,
        "gather_ms": dt * 1e3, "effective_GBps": bw,
        "est_step_ms_40_gathers": dt * 1e3 * 40,
    }))


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("accuracy", "all"):
        accuracy(10 if jax.devices()[0].platform != "tpu" else 20)
    if what in ("timing", "all"):
        timing()
    if what in ("gather", "all"):
        gather()
