"""TPU-scale Sedov physics gate (VERDICT r2 item 10; reference
acceptance: main/src/analytical_solutions/compare_solutions.py:85
computeL1Error at production sizes).

Runs Sedov side^3 on the production resident Pallas engine to a target
simulation time, computes the radial density profile, and writes the
L1 error vs the exact self-similar solution to
artifacts/SEDOV_L1_<side>.json. Run on the real chip:

    python scripts/sedov_gate.py [side] [t_end]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU-forcing for verification runs (JAX_PLATFORMS is ignored once the
# axon TPU plugin registers; the config override is authoritative)
_plat = os.environ.get("SPHEXA_PLATFORM")
if _plat:
    os.environ.pop("JAX_PLATFORMS", None)
    jax.config.update("jax_platforms", _plat)
import jax.numpy as jnp
import numpy as np


def compute_rho(eng, state, box, grid, cfg):
    """VE density rho = kx m / xm from the Pallas xmass+gradh stages on
    a fresh layout of the given particle state."""
    from sphexa_tpu.ops.cellmajor import build_layout, from_cm, to_cm

    ps = state.p
    layout = build_layout(grid, box, ps.x, ps.y, ps.z, alive=ps.alive)
    pve = eng.pve
    base = pve.base_rows(layout, ps.x, ps.y, ps.z, ps.h)
    m_cm = to_cm(layout, ps.m)
    xm, h_new, _nc, _nv = pve.xmass_h(base, m_cm)
    # ghost-correct xm/h via a particle-frame round trip
    xm_pf = from_cm(layout, xm, ps.n, 1.0)
    h_pf = from_cm(layout, h_new, ps.n, 1.0)
    base = [base[0], base[1], base[2], to_cm(layout, h_pf, 1.0), base[4]]
    kx, _gradh = pve.gradh(base, m_cm, to_cm(layout, xm_pf, 1.0))
    kx_pf = from_cm(layout, kx, ps.n, 1.0)
    return np.asarray(kx_pf * ps.m / xm_pf)


def run_xla_phase(state, box, cfg, t_end, t0, steps_done):
    """Deep-contrast fallback: the XLA gather path (fixed-k neighbor
    lists, propagator/ve.py). Compile-safe at ANY h contrast — no
    Mosaic deep-cap kernels — and physics-identical to the Pallas
    engines (golden 99-particle parity, tests/test_golden_ve.py).
    Used where neither the uniform engine (cap > 128 fails the v5e
    remote compile) nor a cap<=128 tier ladder fits (equilibrated
    contrast needs ~10 thin bands, DESIGN.md 'Tier occupancy
    algebra')."""
    from sphexa_tpu.neighbors import CellGrid, choose_level
    from sphexa_tpu.propagator.ve import make_ve_step

    while float(state.ttot) < t_end:
        alive = np.asarray(state.p.alive)
        h_max = float(np.max(np.asarray(state.p.h)[alive]))
        grid = CellGrid(choose_level(box, h_max * 1.25))
        step = make_ve_step(box, grid, cfg)
        print(f"# xla engine: level={grid.level} t={float(state.ttot):.5f}",
              flush=True)
        while float(state.ttot) < t_end:
            for _ in range(10):
                state, d = step(state)
                steps_done += 1
                if float(state.ttot) >= t_end:
                    break
            nc_max = int(d.max_nc)
            print(f"#   t={float(state.ttot):.5f} dt={float(d.dt):.3e} "
                  f"max_nc={nc_max} steps={steps_done} "
                  f"wall={time.perf_counter() - t0:.0f}s", flush=True)
            assert nc_max <= cfg.ngpad, (
                f"neighbor-list truncation: max_nc {nc_max} > ngpad "
                f"{cfg.ngpad}")
            alive = np.asarray(state.p.alive)
            h_now = float(np.max(np.asarray(state.p.h)[alive]))
            if choose_level(box, h_now * 1.25) != grid.level:
                break   # h outgrew the search grid: rebuild
    return state, steps_done


def compute_rho_xla(state, box, cfg):
    """(sorted particles, VE density) from a forces-only gather pass on
    the final state."""
    from sphexa_tpu.neighbors import CellGrid, choose_level
    from sphexa_tpu.propagator.ve import compute_forces_ve

    alive = np.asarray(state.p.alive)
    h_max = float(np.max(np.asarray(state.p.h)[alive]))
    grid = CellGrid(choose_level(box, h_max * 1.25))
    ps, _me, aux = jax.jit(
        lambda p, dt: compute_forces_ve(p, box, grid, cfg, dt)
    )(state.p, state.dt)
    return ps, np.asarray(aux["rho"])


def run_tiered_phase(state, box, cfg, t_end, t0, steps_done):
    """Advance to t_end on the adaptive h-tier engine, re-tiering from
    the last good state whenever the fold fail-stop trips (the
    main-loop re-tier semantics, main.py). Returns tiers=None (with
    the state advanced as far as tiering got) when no feasible ladder
    exists — the caller falls back to the XLA gather phase."""
    from sphexa_tpu.propagator.ve_tiered import (choose_tiers_auto,
                                                 make_ve_step_pallas_tiered)

    interp = jax.devices()[0].platform != "tpu"
    retier = 0
    tiers = None
    while float(state.ttot) < t_end:
        p = state.p
        alive = np.asarray(p.alive)
        try:
            tiers = choose_tiers_auto(box, p.x, p.y, p.z, p.h, alive=alive,
                                      cap_max=128, verbose=True)
        except ValueError as e:
            print(f"# tiering infeasible ({e}); falling back", flush=True)
            return state, None, steps_done
        print(f"# tiered engine: {[(t.grid.n, t.grid.cap) for t in tiers]} "
              f"t={float(state.ttot):.5f}", flush=True)
        step = make_ve_step_pallas_tiered(box, tiers, cfg,
                                          interpret=interp)
        folded = False
        while float(state.ttot) < t_end:
            saved = state
            fold = 0
            for _ in range(10):
                state, d = step(state)
                steps_done += 1
                fold = int(d.max_cell_count)
                if fold or float(state.ttot) >= t_end:
                    break
            print(f"#   t={float(state.ttot):.5f} dt={float(d.dt):.3e} "
                  f"fold={fold} steps={steps_done} "
                  f"wall={time.perf_counter() - t0:.0f}s", flush=True)
            if fold:
                # h outgrew a tier band / slot overflow: re-tier from
                # the last good state (fresh bands follow the realized
                # h distribution)
                state = saved
                retier += 1
                if retier >= 8:
                    print("# re-tiering does not converge; falling back",
                          flush=True)
                    return state, None, steps_done
                folded = True
                break
        if not folded:
            break
    return state, tiers, steps_done


def compute_rho_tiered(state, box, cfg, tiers):
    """VE density from a forces-only tiered pass on the FINAL state
    (consistent positions/rho, unlike reusing the last step's diag)."""
    from sphexa_tpu.propagator.ve_tiered import (_build_layouts,
                                                 _tier_engines,
                                                 _tiered_forces)

    interp = jax.devices()[0].platform != "tpu"
    engines = _tier_engines(tiers, cfg, interpret=interp)

    @jax.jit
    def rho_of(st):
        layouts = _build_layouts(engines, box, st.p)
        return _tiered_forces(st.p, st.dt, layouts, engines, box, cfg)["rho"]

    return np.asarray(rho_of(state))


def main():
    from sphexa_tpu.config import SphConfig
    from sphexa_tpu.init.sedov import init_sedov
    from sphexa_tpu.observables.radial import (l1_error, radial_profile,
                                               shock_radius_from_density)
    from sphexa_tpu.observables.sedov_solution import (sedov_profile,
                                                       shock_radius)
    from sphexa_tpu.ops.cellmajor import choose_cap_and_grid
    from sphexa_tpu.propagator.ve_pallas import ResidentVE

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    t_end = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
    cfg = SphConfig()
    state, box, cfg = init_sedov(side, cfg, dt0=1e-5)
    n = side ** 3
    headroom = 8
    t0 = time.perf_counter()
    steps_done = 0
    # Engine choice for the developed shock (the h-contrast study,
    # DESIGN.md 'Tier occupancy algebra'): Sedov's h field is
    # EQUILIBRATED (nc ~ ng0 everywhere, contrast ~5x) — a tier cell
    # holds ~0.24*ng0*(SLACK*gs)^3*(theta*h_hi/h_lo)^3 particles, so
    # cap-128 tiers would need ~10 ultra-thin bands (10 engine
    # compiles). The deep-cap uniform engine is the right tool here;
    # tiers pay off on spatially-segregated contrast (Evrard).
    # CAP_STRUCT is the compile-feasibility ceiling of the uniform
    # kernels. i-row blocking bounds the Mosaic VMEM stack, but the
    # remote v5e compile helper still dies at caps >= 256 even with
    # IB=128 (tpu_queue8 probes: HTTP 500 at cap 256/384) — so the
    # measured structural ceiling on this chip is 128; beyond it the
    # gate rides the adaptive tiered engine (cap<=128 per tier).
    CAP_STRUCT = int(os.environ.get("SPHEXA_CAP_STRUCT", "128"))
    tiers = None
    xla_mode = False

    while float(state.ttot) < t_end:
        alive = np.asarray(state.p.alive)
        h_eff = float(np.max(np.asarray(state.p.h)[alive])) * 1.2
        cap, grid = choose_cap_and_grid(
            box, h_eff, n, np.asarray(state.p.x)[alive],
            np.asarray(state.p.y)[alive], np.asarray(state.p.z)[alive],
            headroom=headroom)
        if cap > CAP_STRUCT:
            # deep-contrast phase: Sedov's h field is equilibrated, so
            # cap-128 tiers need ~10 thin bands (10 Mosaic compiles) —
            # the XLA gather path is the default deep engine here;
            # SPHEXA_GATE_DEEP=tiered opts into the tier ladder (with
            # the same gather fallback on infeasibility).
            if os.environ.get("SPHEXA_GATE_DEEP", "xla") == "tiered":
                state, tiers, steps_done = run_tiered_phase(
                    state, box, cfg, t_end, t0, steps_done)
            if tiers is None and float(state.ttot) < t_end:
                state, steps_done = run_xla_phase(
                    state, box, cfg, t_end, t0, steps_done)
                xla_mode = True
            break
        print(f"# engine: cap={cap} grid={grid} t={float(state.ttot):.5f}",
              flush=True)
        interp = jax.devices()[0].platform != "tpu"
        eng = ResidentVE(box, grid, cfg, interpret=interp)
        rst = eng.bind(state)
        overflowed = False
        while float(rst.ttot) < t_end:
            # snapshot the retry point BEFORE stepping: steps() donates
            # the frame, and an overflowed frame has silently DROPPED
            # particles (unbind marks them dead) — retrying from it
            # would corrupt the gate physics
            saved = eng.unbind(rst, n)
            rst, diags = eng.steps(rst, 20)
            steps_done += 20
            ovf = int(diags.overflow[-1])
            print(f"#   t={float(rst.ttot):.5f} dt={float(rst.dt):.3e} "
                  f"ovf={ovf} steps={steps_done} "
                  f"wall={time.perf_counter() - t0:.0f}s", flush=True)
            if ovf:
                # re-grid with more headroom from the last GOOD frame
                # (main.py's fail-stop + retry semantics)
                state = saved
                headroom *= 2
                overflowed = True
                break
        if not overflowed:
            state = eng.unbind(rst, n)
            break

    t_fin = float(state.ttot)
    px, py, pz = state.p.x, state.p.y, state.p.z
    if xla_mode:
        ps, rho = compute_rho_xla(state, box, cfg)
        px, py, pz = ps.x, ps.y, ps.z
    elif tiers is not None:
        rho = compute_rho_tiered(state, box, cfg, tiers)
    else:
        rho = compute_rho(eng, state, box, grid, cfg)
    centers, rho_sim, counts = radial_profile(
        px, py, pz, jnp.asarray(rho), nbins=64,
        rmax=0.45)
    rho_ana, _, _ = sedov_profile(centers, t_fin, E=1.0, rho0=1.0,
                                  gamma=cfg.gamma)
    ok = counts > 10
    err = float(l1_error(rho_sim[ok], rho_ana[ok]))
    rs_meas, rho_pk = shock_radius_from_density(
        px, py, pz, jnp.asarray(rho), nbins=96,
        rmax=0.45)
    rs_exp = float(shock_radius(t_fin, 1.0, 1.0, cfg.gamma))

    out = {
        "side": side, "n": n, "t_end": t_fin, "steps": steps_done,
        "l1_rho": err, "nbins": 64,
        "shock_radius_measured": float(rs_meas),
        "shock_radius_expected": rs_exp,
        "rho_peak": float(rho_pk),
        "platform": jax.devices()[0].platform,
        "wall_s": time.perf_counter() - t0,
    }
    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", f"SEDOV_L1_{side}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    # the production-scale gate: substantially tighter than the 24^3
    # test tolerance (0.35); shock smearing at 100^3 is ~2-3 h wide
    assert err < 0.2, f"L1 density error {err} at side {side}"


if __name__ == "__main__":
    main()
