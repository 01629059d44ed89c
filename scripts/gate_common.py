"""Shared crash-resumable machinery for the TPU physics gates.

Round-4 postmortem (VERDICT r4 weak #8): the dominant failure mode on
the tunneled v5e is the TPU worker process dying mid-run
(JaxRuntimeError UNAVAILABLE / remote-compile HTTP 500) — once the
backend is gone the Python process cannot recover it, so the only
robust resume unit is the PROCESS. The gates therefore snapshot the
full conserved state to disk every few blocks through the framework's
own checkpoint writer (io/hdf5.save_checkpoint — the same dump-is-the-
checkpoint design as the reference, README.md:184-192), and an outer
shell loop (scripts/gate_loop.sh) reruns the gate script until it
writes a final artifact; each rerun resumes from the newest snapshot.

Artifacts carry an explicit "pass" flag, and failing runs are written
under artifacts/failed/ (VERDICT r4 weak #3 — a failing result must
not sit in artifacts/ unlabeled). Exit codes: 0 = gate passed,
2 = gate ran to completion but FAILED its threshold (no retry),
anything else = crash (the loop retries from the snapshot).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(ROOT, "artifacts")
CKPT_DIR = os.path.join(ART, "ckpt")

GATE_FAIL_RC = 2


class GateCkpt:
    """Host-side snapshot of (SimState, gate metadata) for one gate run.

    save() is atomic (tmp + rename) so a worker crash mid-write never
    corrupts the resume point.
    """

    def __init__(self, name: str):
        os.makedirs(CKPT_DIR, exist_ok=True)
        self.h5 = os.path.join(CKPT_DIR, f"{name}.h5")
        self.meta_path = os.path.join(CKPT_DIR, f"{name}.json")
        self.meta: dict = {}

    def exists(self) -> bool:
        return os.path.exists(self.h5) and os.path.exists(self.meta_path)

    def save(self, state, cfg, box, **meta):
        from sphexa_tpu.io.hdf5 import save_checkpoint

        tmp = self.h5 + ".tmp"
        if os.path.exists(tmp):
            os.remove(tmp)
        save_checkpoint(tmp, state, cfg, box)
        os.replace(tmp, self.h5)
        self.meta.update(meta)
        self.meta["saved_at"] = time.time()
        with open(self.meta_path + ".tmp", "w") as f:
            json.dump(self.meta, f)
        os.replace(self.meta_path + ".tmp", self.meta_path)

    def load(self, cfg, capacity: int):
        from sphexa_tpu.io.hdf5 import load_checkpoint

        with open(self.meta_path) as f:
            self.meta = json.load(f)
        state, box, cfg = load_checkpoint(self.h5, cfg, capacity=capacity)
        self.meta["resumes"] = self.meta.get("resumes", 0) + 1
        # persist the incremented count NOW: a crash-looping attempt
        # that never reaches its next snapshot would otherwise report
        # resumes=1 forever
        with open(self.meta_path + ".tmp", "w") as f:
            json.dump(self.meta, f)
        os.replace(self.meta_path + ".tmp", self.meta_path)
        return state, box, cfg

    def save_meta(self, **meta):
        """Persist metadata WITHOUT touching the device (usable when
        the backend is poisoned and no array can be read back)."""
        self.meta.update(meta)
        with open(self.meta_path + ".tmp", "w") as f:
            json.dump(self.meta, f)
        os.replace(self.meta_path + ".tmp", self.meta_path)

    def clear(self):
        for p in (self.h5, self.meta_path):
            if os.path.exists(p):
                os.remove(p)


def force_platform_from_env():
    """SPHEXA_PLATFORM=cpu forcing for verification runs (JAX_PLATFORMS
    is ignored once the axon TPU plugin registers; the config override
    is authoritative)."""
    import jax

    plat = os.environ.get("SPHEXA_PLATFORM")
    if plat:
        os.environ.pop("JAX_PLATFORMS", None)
        jax.config.update("jax_platforms", plat)


def write_artifact(name: str, out: dict, passed: bool) -> str:
    """Write the gate artifact under artifacts/ when it passes, under
    artifacts/failed/ when it does not; always stamps "pass"."""
    out = dict(out)
    out["pass"] = bool(passed)
    sub = ART if passed else os.path.join(ART, "failed")
    os.makedirs(sub, exist_ok=True)
    path = os.path.join(sub, f"{name}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    # a newly failing result must not leave a stale passing artifact
    # behind (and vice versa)
    other = os.path.join(ART if not passed else os.path.join(ART, "failed"),
                         f"{name}.json")
    if os.path.exists(other):
        os.remove(other)
    print(json.dumps(out))
    return path


def resident_advance(state, box, cfg, t_end, t0, ck, side,
                     cap_struct: int = 128, block: int = 20,
                     snapshot_every: int = 2, hclamp_frac_max: float = 0.05,
                     deep: str = "hcap", on_budget: str = "raise"):
    """Advance `state` to t_end on the resident cell-major Pallas
    engine, staying INSIDE the structural cap ceiling for the whole
    run. Crash-resumable: snapshots via `ck` every `snapshot_every`
    good blocks.

    Engine planning per phase: `choose_cap_and_grid` at the realized
    h_max while it fits cap <= cap_struct; once the h contrast forces
    a coarser grid past the ceiling (the v5e Mosaic compile wall at
    cap 256, tpu_queue8), switch to the bounded-h plan
    (`choose_grid_with_hcap` + SphConfig.h_cap): clamp the rarefied-
    cavity smoothing lengths so the grid stays occupancy-sized. The
    clamped fraction is asserted < hclamp_frac_max — for Sedov the
    clamp only ever touches the low-density interior cavity, which the
    L1 profile metric down-weights (counts>10 bins).

    deep="hcap" (default) engages the bounded-h plan on deep contrast;
    deep="return" instead hands control back to the caller (whose own
    deep phase — e.g. the tiered engine for spatially-segregated
    contrast like Noh/Evrard — takes over): the return is then
    (state, cfg, None, None, steps_done).

    on_budget="stop": when the NEXT bounded-h plan would exceed the
    clamp budget (a growing structure like the Noh plateau eventually
    defeats every cap-128 uniform grid), return the farthest VALID
    state instead of raising — the caller gates at the reached time.

    Overflow handling backs the block size off (20 -> 5 -> 1) before
    escalating headroom, so the good prefix of a partially-overflowing
    block is kept, and the escalated headroom persists in the gate
    metadata (a crash-restart would otherwise replay the same plan).

    Returns (state, cfg_used, eng, grid, steps_done) at t >= t_end
    (or at the budget stop).
    """
    import jax

    from sphexa_tpu.ops.cellmajor import (choose_cap_and_grid,
                                          choose_grid_with_hcap)
    from sphexa_tpu.propagator.ve_pallas import ResidentVE

    n = int(ck.meta.get("n_alive", np.asarray(state.p.alive).sum()))
    headroom = int(ck.meta.get("headroom", 8))
    steps_done = int(ck.meta.get("steps_done", 0))
    wall_prev = float(ck.meta.get("wall_s", 0.0))
    # sticky: once a run enters the bounded-h phase it stays there —
    # a resume would otherwise see the clamped h_max, re-plan the
    # unbounded engine, watch h regrow to the stencil bound, and
    # re-plan again (each oscillation costs a Mosaic compile)
    hcap_mode = bool(ck.meta.get("hcap_mode", False))
    interp = jax.devices()[0].platform != "tpu"
    cfg_run = cfg
    eng = grid = None

    def plan(state):
        nonlocal cfg_run, hcap_mode
        alive = np.asarray(state.p.alive)
        xs = np.asarray(state.p.x)[alive]
        ys = np.asarray(state.p.y)[alive]
        zs = np.asarray(state.p.z)[alive]
        h_alive = np.asarray(state.p.h)[alive]
        h_eff = float(h_alive.max()) * 1.2
        if not hcap_mode:
            try:
                cap, grid = choose_cap_and_grid(box, h_eff, n, xs, ys, zs,
                                                cap_max=cap_struct,
                                                headroom=headroom)
                cfg_run = cfg
                return cap, grid, state
            except ValueError:
                if deep != "hcap":
                    return None, None, state
                hcap_mode = True
        # deep-contrast phase: bound h instead of deepening the cap
        cap, grid, h_cap = choose_grid_with_hcap(
            box, n, xs, ys, zs, cap_max=cap_struct, headroom=headroom)
        frac = float((h_alive > h_cap).mean())
        print(f"# h-cap plan: cap={cap} grid={grid} h_cap={h_cap:.4g} "
              f"(clamps {100 * frac:.2f}% of particles)", flush=True)
        assert frac < hclamp_frac_max, (
            f"h_cap {h_cap:.4g} would clamp {100 * frac:.1f}% of "
            f"particles (> {100 * hclamp_frac_max:.0f}% budget) — "
            f"contrast too broad for the uniform bounded-h engine")
        cfg_run = cfg.replace(h_cap=float(h_cap))
        state = state.replace(p=state.p.replace(
            h=np.minimum(np.asarray(state.p.h), h_cap)))
        return cap, grid, state

    block_cur = block
    while float(state.ttot) < t_end or eng is None:
        try:
            cap, grid, state = plan(state)
        except AssertionError:
            if on_budget == "stop" and eng is not None:
                print(f"# bounded-h envelope exhausted at "
                      f"t={float(state.ttot):.5f}; gating at the "
                      f"reached time", flush=True)
                return state, cfg_run, eng, grid, steps_done
            raise
        if cap is None:   # deep contrast, caller's deep phase takes over
            ck.meta.update(steps_done=steps_done, headroom=headroom)
            return state, cfg, None, None, steps_done
        print(f"# engine: cap={cap} grid={grid} t={float(state.ttot):.5f} "
              f"hcap={cfg_run.h_cap:.4g} steps={steps_done}", flush=True)
        eng = ResidentVE(box, grid, cfg_run, interpret=interp)
        rst = eng.bind(state)
        if int(np.asarray(rst.overflow)) != 0:
            # the plan itself doesn't fit (headroom too small for the
            # realized occupancy): grow headroom and re-plan
            headroom *= 2
            assert headroom <= 256, "bind overflow persists at headroom 256"
            continue
        overflowed = False
        steps_since_snap = 0
        while float(rst.ttot) < t_end:
            # snapshot the retry point BEFORE stepping: steps() donates
            # the frame, and an overflowed frame has silently DROPPED
            # particles (unbind marks them dead)
            saved = eng.unbind(rst, state.p.n)
            # trim the final blocks so the run doesn't overshoot t_end
            # by a whole block once dt has grown; quantized sizes keep
            # the number of distinct scan compiles bounded. block_cur
            # also backs off after an overflow (salvage the good
            # prefix of a partially-overflowing block).
            need = max(1, int((t_end - float(rst.ttot))
                              / max(float(rst.dt), 1e-30)) + 1)
            k = next(b for b in (block_cur, 5, 1)
                     if b <= max(need, 1) and b <= block_cur)
            rst, diags = eng.steps(rst, k)
            steps_done += k
            ovf = int(diags.overflow[-1])
            ncl = int(diags.n_hclamped[-1])
            wall = wall_prev + time.perf_counter() - t0
            print(f"#   t={float(rst.ttot):.5f} dt={float(rst.dt):.3e} "
                  f"ovf={ovf} hclamp={ncl} steps={steps_done} "
                  f"wall={wall:.0f}s", flush=True)
            if ovf:
                state = saved
                steps_done -= k   # the overflowed block is discarded
                if block_cur > 1:
                    # back the block off first: keep the good prefix
                    # instead of replaying 20 steps into the same wall
                    block_cur = 5 if block_cur > 5 else 1
                    rst = eng.bind(state)
                    if int(np.asarray(rst.overflow)) == 0:
                        continue
                headroom *= 2
                assert headroom <= 1024, ("overflow persists at "
                                          "headroom 1024")
                # persist: a crash-restart must not replay the same
                # exhausted plan (queue14: identical plan/ovf cycles)
                ck.save_meta(headroom=headroom)
                overflowed = True
                break
            if ncl:
                assert ncl < hclamp_frac_max * n, (
                    f"h-cap clamp population grew to {ncl} "
                    f"(> {hclamp_frac_max:.0%} of {n})")
            if int(diags.need_regrid[-1]):
                # pre-emptive: unclamped h_max is approaching the
                # 27-stencil support bound of this grid (2*h*1.05 >=
                # cell_edge) — re-plan BEFORE neighbor sets go
                # incomplete. The state is still good (the flag fires
                # at a 5% margin), so no discard.
                state = eng.unbind(rst, state.p.n)
                overflowed = True   # re-enter the planning loop
                break
            steps_since_snap += k
            block_cur = min(block, block_cur * 2)   # recover after backoff
            if steps_since_snap >= snapshot_every * block:
                steps_since_snap = 0
                snap = eng.unbind(rst, state.p.n)
                ck.save(snap, cfg_run, box, steps_done=steps_done,
                        headroom=headroom, n_alive=n, side=side,
                        hcap_mode=hcap_mode, phase="resident",
                        wall_s=wall)
        if not overflowed:
            state = eng.unbind(rst, state.p.n)
            break
    return state, cfg_run, eng, grid, steps_done


def gate_wall(ck, t0) -> float:
    return float(ck.meta.get("wall_s", 0.0)) + time.perf_counter() - t0
