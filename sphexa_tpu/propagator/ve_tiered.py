"""Multi-tier cell-major VE step for clustered density contrast — the
TPU redesign of the reference's adaptive-resolution role (cstone
focused octree, focus/octree_focus_mpi.hpp:51; tree rebalance,
tree/csarray.hpp:433).

The uniform cell-major grid needs cell edge >= 2*h_max, so a density
contrast of C packs ~C cells of particles into one slot cap (Evrard-30
needed CAP 416, whose Mosaic compile takes tens of minutes). Instead,
particles are partitioned into h-TIERS with data-driven boundaries:

  - tier t owns i-particles with h in [h_lo_t, h_hi_t); its grid has
    cell edge >= 2*h_hi_t*slack, so the standard 27-stencil Pallas
    engine (ops/pallas_ve.py) is exact for tier-t i's.
  - each tier's grid spans only the SUBBOX around its own particles
    (bbox + a 2*edge margin), so fine tiers zoom onto the dense core
    instead of gridding the whole box — the focus-tree zoom, on dense
    arrays.
  - tier t's FRAME (the j-candidates binned into its grid) holds every
    subbox particle with h_j >= h_lo_t / theta: coarser particles are
    always present (sparse everywhere, so they never inflate the cap);
    fine particles from deeper tiers are excluded by the theta-band.
    The band rests on SPH's h-continuity (the nc->h controller keeps
    neighbor h-ratios near 1); it is NOT assumed blindly —
    `audit_tiers` verifies exactly (host-side, at tier construction
    and at every re-grid) that no excluded particle lies inside any
    in-tier particle's 2h support, and the run fail-stops on violation
    in the same spirit as the cell-cap overflow handling (main.py).
  - per step every tier runs the SAME five pair stages; per-particle
    outputs are gathered from the tier that owns the particle's h.

Every tier keeps CAP <= cap_max (<= 128), so Mosaic compiles stay flat
and the dense core streams fine-grained windows instead of paying
CAP^2 overcompute.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from sphexa_tpu.config import SphConfig
from sphexa_tpu.ops.cellmajor import (CMGrid, build_layout,
                                      choose_cap_and_grid, from_cm,
                                      interior_mask, to_cm)
from sphexa_tpu.ops.pallas_ve import PallasVE
from sphexa_tpu.sfc.box import Box, Boundary

SLACK = 1.05


@dataclasses.dataclass(frozen=True)
class TierSpec:
    """One h-tier: i-particles with h in [h_lo, h_hi) run on `grid`
    over `sub` (a zoom Box, open in every dim it does not fully span);
    the frame holds subbox particles with h >= cutoff (= h_lo / theta).

    `shift` is the periodic-roll applied to coordinates before binning
    (one value per dim, identical across a tier set): for a periodic
    box the cut plane is placed in the emptiest region, so a cluster
    wrapping a face becomes contiguous in the shifted frame and the
    open-boundary zoom works unchanged — the reference octree is
    BC-agnostic (cstone/sfc/box.hpp); this is the dense-grid analog."""
    h_lo: float
    h_hi: float
    cutoff: float
    grid: CMGrid
    sub: Box
    shift: tuple = (0.0, 0.0, 0.0)


def tier_coords(box: Box, shift, x, y, z):
    """Coordinates in the tier set's rolled frame: x' = ((x - xmin -
    sx) mod lx) + xmin for shifted periodic dims, identity otherwise."""
    def roll(v, lo, ln, s):
        if s == 0.0:
            return v
        return jnp.mod(v - lo - s, ln) + lo
    return (roll(x, box.xmin, box.lx, shift[0]),
            roll(y, box.ymin, box.ly, shift[1]),
            roll(z, box.zmin, box.lz, shift[2]))


def choose_shift(box: Box, x, y, z, nbins: int = 64):
    """Per-dim periodic roll placing the cut at the emptiest histogram
    bin's LEFT edge (host-side, at tier construction). Open dims get
    shift 0."""
    out = []
    for coords, per, lo, ln in ((x, box.periodic[0], box.xmin, box.lx),
                                (y, box.periodic[1], box.ymin, box.ly),
                                (z, box.periodic[2], box.zmin, box.lz)):
        if not per:
            out.append(0.0)
            continue
        histo, edges = np.histogram(np.asarray(coords),
                                    bins=nbins, range=(lo, lo + ln))
        out.append(float(edges[int(np.argmin(histo))] - lo))
    return tuple(out)


def tier_support_bound(tier: TierSpec) -> float:
    """Largest h the tier grid's 27-stencil can serve (edge/2/slack)."""
    g, b = tier.grid, tier.sub
    edge = min(b.lx / g.nx, b.ly / g.n, b.lz / g.nz)
    return edge / (2.0 * SLACK)


def _subbox(box: Box, xs, ys, zs, margin: float) -> Box:
    """Cubified bbox + margin, clipped to the global box. A dim the
    clipped cube fully spans keeps the global box's boundary condition
    (a full-span periodic dim wraps its ghost cells); partially-spanned
    dims are open — valid because coordinates enter in the tier set's
    rolled frame, where the cluster is contiguous."""
    lo = np.array([xs.min() - margin, ys.min() - margin, zs.min() - margin])
    hi = np.array([xs.max() + margin, ys.max() + margin, zs.max() + margin])
    c = 0.5 * (lo + hi)
    half = 0.5 * float((hi - lo).max())
    lo, hi = c - half, c + half
    glo = np.array([box.xmin, box.ymin, box.zmin])
    ghi = np.array([box.xmax, box.ymax, box.zmax])
    full = (lo <= glo) & (hi >= ghi)
    lo, hi = np.maximum(lo, glo), np.minimum(hi, ghi)
    bcs = [b if (f and b == Boundary.periodic) else Boundary.open
           for f, b in zip(full, (box.bx, box.by, box.bz))]
    return Box(lo[0], hi[0], lo[1], hi[1], lo[2], hi[2],
               bx=bcs[0], by=bcs[1], bz=bcs[2])


def choose_tiers(box: Box, x, y, z, h, alive=None, cap_max: int = 128,
                 theta: float = 1.5, max_tiers: int = 4,
                 n_candidates: int = 16, grid_slack: float = 1.1,
                 top_headroom: float = 1.6, cap_max_top: int | None = None,
                 headroom: int = 8):
    """Greedy top-down tier construction from the realized h
    distribution: the coarsest tier takes h_hi = h_max and stretches
    h_lo as deep as the cap budget allows; the remainder recurses on
    its own (smaller) subbox. Returns list[TierSpec], coarsest first;
    a single entry means a uniform grid fits (use the plain engine).
    The theta band must be validated by `audit_tiers` before use.

    grid_slack > 1 sizes each tier grid for h_hi * grid_slack instead
    of h_hi, trading cell occupancy (cap) for headroom spent as h-growth
    room (and, on the RESIDENT engine, drift margin). With slack 1.0
    the tier support bound sits exactly at h_hi, so ANY upward h
    adaptation — including a particle legitimately crossing into the
    coarser tier's band — trips the clamp fail-stop on the very next
    step (measured: 3600 clamps at Evrard-50 step 1,
    artifacts/tpu_queue.log 2026-08-19). The nc->h controller moves h
    by at most (ng0/nc)^(1/10) per step, so 1.1 absorbs several steps
    of growth between host re-tier boundaries.

    top_headroom > 1 additionally oversizes the COARSEST tier's cells:
    the top band is open from above (no coarser tier to migrate into),
    and vacuum-edge dynamics legitimately GROW h_max (Evrard's
    rarefying envelope: 1680+ clamps/step once collapse starts,
    tpu_queue7.log 2026-08-19) — without headroom every such growth
    clamp-folds and forces a host re-tier that lifts the roof by only
    ~grid_slack. The occupancy cost is cubic but confined to the
    sparse coarse band; cap_max_top admits the deeper top-tier cap
    (i-row-blocked kernels hold the Mosaic stack at ~IB rows for any
    cap, pallas_ve.make_cell_pair_call)."""
    if cap_max_top is None:
        # 384 is the i-row-blocked design ceiling; the v5e remote
        # compile helper still dies at caps >= 256 (tpu_queue8 probes),
        # so TPU runs pin this to 128 via the env knob — the ladder
        # then degrades to headroom-free top tiers where the oversized
        # grid can't fit its cap budget.
        cap_max_top = int(os.environ.get("SPHEXA_CAP_MAX_TOP", "384"))
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    h = np.asarray(h, np.float64)
    if alive is not None:
        keep = np.asarray(alive)
        x, y, z, h = x[keep], y[keep], z[keep], h[keep]
    h_min, h_max = float(h.min()), float(h.max())

    # periodic dims: roll so a cluster wrapping a face becomes
    # contiguous (cut at the emptiest histogram bin); open dims shift 0
    shift = choose_shift(box, x, y, z)
    if any(s != 0.0 for s in shift):
        x, y, z = (np.asarray(v) for v in tier_coords(
            box, shift, jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)))

    def fit(h_hi: float, h_lo: float, top: bool = False):
        """(grid, sub) for tier [h_lo, h_hi) or None if cap > cap_max.
        The top tier sizes cells for h_hi * grid_slack * top_headroom
        (open-from-above band, see docstring) with its own cap budget."""
        h_eff = h_hi * grid_slack * (top_headroom if top else 1.0)
        sel = (h >= h_lo) & (h < h_hi)
        if not sel.any():
            return None
        sub = _subbox(box, x[sel], y[sel], z[sel],
                      margin=2.0 * 2.0 * h_eff * SLACK)
        inbox = ((x >= sub.xmin) & (x <= sub.xmax) & (y >= sub.ymin)
                 & (y <= sub.ymax) & (z >= sub.zmin) & (z <= sub.zmax))
        frame = inbox & (h >= h_lo / theta)
        try:
            # headroom (default 8): slots beyond the realized max count
            # so a few steps of drift/compression between host
            # re-tierings don't overflow (measured: fold=29 after 2
            # rung cycles on the periodic spiked cluster with zero
            # headroom). Callers ESCALATE it on overflow-fold retries —
            # a re-tier from the same distribution is otherwise
            # deterministic futility (noh gate queue10 2026-08-20:
            # fold=16 reproduced across 8 identical re-tiers)
            cap, grid = choose_cap_and_grid(
                sub, h_eff, int(frame.sum()),
                x[frame], y[frame], z[frame], cap_min=32,
                cap_max=(cap_max_top if top else cap_max),
                headroom=headroom)
        except ValueError:
            return None
        return grid, sub

    tiers = []
    h_hi = h_max * 1.0001
    while len(tiers) < max_tiers:
        cands = np.geomspace(max(h_min * 0.999, 1e-12), h_hi, n_candidates)
        top = not tiers
        best = None
        for use_top in ((True, False) if top else (False,)):
            # graceful degradation: when the oversized top grid cannot
            # fit its cap budget (small/dense problems), fall back to
            # the headroom-free top tier rather than failing outright
            for h_lo in cands:                  # prefer the deepest feasible
                r = fit(h_hi, float(h_lo), top=use_top)
                if r is not None:
                    best = (float(h_lo), r)
                    break
            if best is not None:
                top = use_top
                break
        if best is None:
            raise ValueError(
                f"no tier with cap <= {cap_max} fits below h_hi={h_hi:.4g} "
                f"(raise cap_max or theta)")
        h_lo, (grid, sub) = best
        if h_lo > 0.9 * h_hi and len(tiers) > 0:
            # thin-shaving stall: each tier removes <10% of the h range,
            # so max_tiers would burn without covering the contrast
            raise ValueError(
                f"tiering stalls at h_hi={h_hi:.4g} (feasible band too "
                f"thin; raise cap_max or theta)")
        if h_lo <= h_min * 1.001 or len(tiers) == max_tiers - 1:
            h_lo = 0.0
        if h_lo == 0.0 and (r := fit(h_hi, 0.0, top=top)) is None:
            raise ValueError(
                f"final tier [0, {h_hi:.4g}) exceeds cap {cap_max} "
                f"(needs more than {max_tiers} tiers)")
        elif h_lo == 0.0:
            grid, sub = r
        tiers.append(TierSpec(h_lo=h_lo, h_hi=h_hi,
                              cutoff=(h_lo / theta if h_lo > 0 else 0.0),
                              grid=grid, sub=sub, shift=shift))
        if h_lo == 0.0:
            return tiers
        h_hi = h_lo
    raise ValueError(f"more than {max_tiers} tiers needed")


def choose_tiers_auto(box: Box, x, y, z, h, alive=None,
                      cap_max: int = 128, max_tiers: int = 4,
                      verbose: bool = False,
                      cap_max_top: int | None = None,
                      headroom: int = 8):
    """choose_tiers with an adaptive (grid_slack, theta) ladder.

    The two knobs trade off against the cap through the same cell-
    occupancy bound (fringe count ~ 0.24*ng0*(SLACK*gs*theta*band)^3,
    DESIGN.md 'Tier occupancy algebra'):

      grid_slack > 1 buys h-GROWTH headroom (without it any upward h
        adaptation folds the step and forces a host re-tier), at a
        cubic occupancy cost;
      theta sets the frame's fine-h fringe (cutoff = h_lo/theta) — the
        dominant occupancy term. Narrower theta admits fewer fine
        j-candidates; its correctness is NOT assumed: every rung is
        validated by the exact audit (audit_tiers == 0) and rejected
        on violation, exactly like the fail-stops at runtime.

    Measured on Evrard-50 (tpu_queue.log 2026-08-19): slack 1.0 at
    theta 1.5 is the only feasible fixed combo, and it clamp-folds on
    the first adapting step; slack 1.05 fits once theta drops to ~1.3.
    The ladder prefers growth headroom, then fringe width, and falls
    back to the tight combo (which re-tiers every few steps) last."""
    last = None
    rungs = [(gs, th, 1.6) for gs, th in
             ((1.1, 1.5), (1.1, 1.35), (1.075, 1.35), (1.05, 1.3),
              (1.05, 1.2), (1.025, 1.2), (1.0, 1.5), (1.0, 1.3))]
    # wide-roof rungs: MORE top-band growth headroom at narrower theta
    # (the queue9 failure mode was pure top-tier h growth — with the
    # budgeted clamp these rungs buy many re-tier-free steps)
    rungs = ([(1.1, 1.35, 2.2), (1.05, 1.3, 2.2), (1.05, 1.2, 2.8)]
             + rungs)
    # tight fallback: no top-band growth headroom (re-tiers on every
    # h_max advance, but feasible where the oversized top grid is not)
    rungs += [(gs, th, 1.0) for gs, th, _hr in rungs[3:]]
    for gs, th, hr in rungs:
        try:
            tiers = choose_tiers(box, x, y, z, h, alive=alive,
                                 cap_max=cap_max, theta=th,
                                 max_tiers=max_tiers, grid_slack=gs,
                                 top_headroom=hr,
                                 cap_max_top=cap_max_top,
                                 headroom=headroom)
        except ValueError as e:
            last = e
            continue
        if audit_tiers(tiers, box, x, y, z, h, alive=alive) == 0:
            if verbose:
                print(f"# tiers: slack={gs} theta={th} top_headroom={hr} "
                      f"{[(t.grid.n, t.grid.cap) for t in tiers]}")
            return tiers
        last = ValueError(f"band audit violations at slack={gs} "
                          f"theta={th}")
    raise ValueError(f"no feasible (slack, theta) tier ladder rung: {last}")


def choose_tiers_robust(box: Box, x, y, z, h, alive=None,
                        cap_max: int = 128, max_tiers: int = 4,
                        verbose: bool = False,
                        cap_max_top: int | None = None,
                        clip_quantiles=(1.0, 0.995, 0.98, 0.95),
                        headroom: int = 8):
    """choose_tiers_auto that NEVER raises (VERDICT r4 item 3: the
    tiered path must not be able to abort a run).

    Returns (tiers, h_clip): when the raw h distribution admits no
    feasible ladder (drifted fields mid-run can satisfy no rung —
    queue9 2026-08-20 aborted Evrard-50 exactly here), the top h tail
    is clipped at progressively lower quantiles and the ladder re-tried
    — the caller MUST then clamp the state's h at the returned h_clip
    (and set SphConfig.h_cap) so ownership bands stay consistent with
    the clipped distribution; the tail particles ride the bounded-h
    clamp (vacuum-edge envelopes, the h_cap semantics). Falls through
    to (None, None) — "use the XLA gather engine" — only when even the
    clipped ladders fail, so the caller always has a runnable plan.
    """
    hv = np.asarray(h, np.float64)
    av = None if alive is None else np.asarray(alive)
    ha = hv if av is None else hv[av]
    for q in clip_quantiles:
        clip = float(np.quantile(ha, q)) if q < 1.0 else None
        hq = hv if clip is None else np.minimum(hv, clip)
        try:
            tiers = choose_tiers_auto(box, x, y, z, hq, alive=alive,
                                      cap_max=cap_max,
                                      max_tiers=max_tiers,
                                      verbose=verbose,
                                      cap_max_top=cap_max_top,
                                      headroom=headroom)
        except ValueError:
            continue
        if clip is not None and verbose:
            print(f"# tier ladder feasible after h-clip at q={q} "
                  f"({clip:.4g}; {(ha > clip).mean():.2%} clamped)")
        return tiers, clip
    return None, None


def audit_tiers(tiers, box: Box, x, y, z, h, alive=None,
                chunk: int = 8192) -> int:
    """Exact host-side frame-completeness audit: counts (excluded j,
    in-tier i) pairs with d(i, j) < 2 h_i — particles a tier frame
    dropped (theta-band or outside the subbox) that the physics
    actually needs. Zero means every tier pass streamed complete
    candidate sets. Vectorized cell-bucket scan, ~N_excluded * 27 * cap
    per tier."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    h = np.asarray(h, np.float64)
    if alive is not None:
        keep = np.asarray(alive)
        x, y, z, h = x[keep], y[keep], z[keep], h[keep]
    violations = 0
    per = np.array(box.periodic, bool)
    L = np.array([box.lx, box.ly, box.lz])
    for t in tiers:
        sel_i = (h >= t.h_lo) & (h < t.h_hi)
        sub = t.sub
        if any(s != 0.0 for s in t.shift):
            # subbox membership lives in the tier set's rolled frame;
            # distances below stay min-image in the global box (shift-
            # invariant)
            xr, yr, zr = (np.asarray(v) for v in tier_coords(
                box, t.shift, jnp.asarray(x), jnp.asarray(y),
                jnp.asarray(z)))
        else:
            xr, yr, zr = x, y, z
        inbox = ((xr >= sub.xmin) & (xr <= sub.xmax) & (yr >= sub.ymin)
                 & (yr <= sub.ymax) & (zr >= sub.zmin) & (zr <= sub.zmax))
        excl = ~inbox | (h < t.cutoff)
        if not excl.any() or not sel_i.any():
            continue
        xi, yi, zi, hi = x[sel_i], y[sel_i], z[sel_i], h[sel_i]
        # bin in-tier i's on a 2*h_hi grid over the GLOBAL box (excluded
        # j's can sit outside the subbox); compare each excluded j
        # against the 27 neighbor buckets
        edge = 2.0 * float(hi.max()) * SLACK
        nx = max(1, int(box.lx / edge))
        ny = max(1, int(box.ly / edge))
        nz = max(1, int(box.lz / edge))

        # native fast path (csrc/hostgrid.c via ctypes): the Python
        # bucket scan below is its exact reference implementation
        from sphexa_tpu.util.native import band_audit_native
        v = band_audit_native(xi, yi, zi, hi, x[excl], y[excl], z[excl],
                              box, nx, ny, nz)
        if v is not None:
            violations += v
            continue

        def cellid(px, py, pz):
            ix = np.clip(((px - box.xmin) / box.lx * nx).astype(int),
                         0, nx - 1)
            iy = np.clip(((py - box.ymin) / box.ly * ny).astype(int),
                         0, ny - 1)
            iz = np.clip(((pz - box.zmin) / box.lz * nz).astype(int),
                         0, nz - 1)
            return ix, iy, iz

        cxi, cyi, czi = cellid(xi, yi, zi)
        cid_i = (cxi * ny + cyi) * nz + czi
        order = np.argsort(cid_i, kind="stable")
        cid_s = cid_i[order]
        starts = np.searchsorted(cid_s, np.arange(nx * ny * nz + 1))
        xs, ys, zs, hs = xi[order], yi[order], zi[order], hi[order]
        cap = int(np.max(starts[1:] - starts[:-1])) if len(cid_s) else 0

        xj, yj, zj = x[excl], y[excl], z[excl]
        for lo in range(0, len(xj), chunk):
            sl = slice(lo, lo + chunk)
            cxj, cyj, czj = cellid(xj[sl], yj[sl], zj[sl])
            hit = np.zeros(cxj.shape, bool)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        qx, qy, qz = cxj + dx, cyj + dy, czj + dz
                        if per[0]:
                            qx %= nx
                        if per[1]:
                            qy %= ny
                        if per[2]:
                            qz %= nz
                        ok = ((qx >= 0) & (qx < nx) & (qy >= 0) & (qy < ny)
                              & (qz >= 0) & (qz < nz))
                        qc = np.where(ok, (qx * ny + qy) * nz + qz, 0)
                        s0 = starts[qc]
                        cnt = starts[qc + 1] - s0
                        for k in range(cap):
                            take = ok & (k < cnt)
                            if not take.any():
                                continue
                            idx = np.where(take,
                                           s0 + np.minimum(k, cnt - 1), 0)
                            ddx = xj[sl] - xs[idx]
                            ddy = yj[sl] - ys[idx]
                            ddz = zj[sl] - zs[idx]
                            if per[0]:
                                ddx -= np.round(ddx / L[0]) * L[0]
                            if per[1]:
                                ddy -= np.round(ddy / L[1]) * L[1]
                            if per[2]:
                                ddz -= np.round(ddz / L[2]) * L[2]
                            d2 = ddx * ddx + ddy * ddy + ddz * ddz
                            hit |= take & (d2 < (2.0 * hs[idx]) ** 2)
            violations += int(hit.sum())
    return violations


def _tier_engines(tiers, cfg: SphConfig, interpret: bool):
    """(tier, PallasVE, interior mask, h support bound) per tier."""
    return [(t, PallasVE(t.grid, cfg, interpret=interpret),
             interior_mask(t.grid), tier_support_bound(t)) for t in tiers]


def _tier_sels(engines, ps, h0):
    """Owner masks: tier t owns alive particles with h in [h_lo, h_hi);
    the coarsest tier owns everything above its h_lo (h may adapt past
    the IC-time h_max between re-tierings; the grid-bound clamp caps
    the growth it can serve)."""
    sels = []
    for ti, (t, pve, intmask, h_bound) in enumerate(engines):
        sel = ps.alive & (h0 >= t.h_lo)
        if ti > 0:
            sel = sel & (h0 < t.h_hi)
        sels.append(sel)
    return sels


def _tier_frame_coords(engines, box: Box, ps):
    """The tier set's rolled-frame coordinates (identity when no dim
    is shifted). All tiers of a set share one shift."""
    shift = engines[0][0].shift
    return tier_coords(box, shift, ps.x, ps.y, ps.z)


def _build_layouts(engines, box: Box, ps):
    """Per-tier frame layouts from current positions/h (in-graph)."""
    xr, yr, zr = _tier_frame_coords(engines, box, ps)
    layouts = []
    for t, pve, intmask, h_bound in engines:
        sub = t.sub
        inbox = ((xr >= sub.xmin) & (xr <= sub.xmax)
                 & (yr >= sub.ymin) & (yr <= sub.ymax)
                 & (zr >= sub.zmin) & (zr <= sub.zmax))
        frame = ps.alive & inbox & (ps.h >= t.cutoff)
        layouts.append(build_layout(t.grid, sub, xr, yr, zr,
                                    alive=frame))
    return tuple(layouts)


def make_ve_step_pallas_tiered(box: Box, tiers, cfg: SphConfig,
                               interpret: bool = False,
                               split_gravity: bool | None = None):
    """Particle-frame tiered VE step: same in/out contract as
    make_ve_step_pallas, but each h-tier runs on its own zoom grid.
    Rebuilds every tier layout each step; see
    make_ve_step_pallas_tiered_resident for the persistent-layout
    variant (the incremental focus-tree analog).

    split_gravity (default: the SPHEXA_SPLIT_GRAVITY env var): compute
    the FMM in its OWN jitted program, python-composed with the SPH
    program per step. Workaround for the v5e runtime failure where the
    SECOND program combining Pallas custom calls with the conv-FMM in
    one executable dies at its first executions (INVALID_ARGUMENT /
    worker crash — queue4/5 logs 2026-08-19; N Pallas-only and N
    FMM-only programs are both fine). Costs one extra dispatch per
    step; the returned step is then a plain python callable (not
    scannable)."""
    import os as _os
    engines = _tier_engines(tiers, cfg, interpret)
    if split_gravity is None:
        split_gravity = (_os.environ.get("SPHEXA_SPLIT_GRAVITY") == "1"
                         and cfg.gravG != 0.0)

    if not split_gravity:
        @jax.jit
        def step(state):
            layouts = _build_layouts(engines, box, state.p)
            return _tiered_body(state, layouts, engines, box, cfg)

        return step

    from sphexa_tpu.propagator.common import finish_step
    from sphexa_tpu.propagator.ve_pallas import _add_gravity

    @jax.jit
    def sph_part(state):
        layouts = _build_layouts(engines, box, state.p)
        return _tiered_forces(state.p, state.dt, layouts, engines, box,
                              cfg)

    @jax.jit
    def grav_part(x, y, z, m, alive, ax, ay, az):
        out = dict(ax=ax, ay=ay, az=az, du=jnp.zeros_like(ax),
                   maxvsignal=jnp.zeros_like(ax))
        out, egrav, nf = _add_gravity(out, x, y, z, m, alive, box, cfg)
        return out["ax"], out["ay"], out["az"], egrav, nf

    @jax.jit
    def finish(state, fo, ax, ay, az, egrav, nf_trunc):
        ps = state.p
        ps2 = ps.replace(h=fo["h"], alpha=fo["alpha"])
        max_nc = jnp.max(jnp.where(ps.alive, fo["nc_sph"] - 1.0, 0.0))
        return finish_step(
            state, ps2, ax, ay, az, fo["du"], fo["maxvsignal"],
            fo["c"], fo["divv"], fo["nc_sph"], box, cfg,
            max_nc=max_nc.astype(jnp.int32),
            max_cell_count=fo["fold"].astype(jnp.int32),
            egrav=egrav, nf_truncated=nf_trunc, rho=fo["rho"],
            p=fo["p"])

    def step(state):
        fo = sph_part(state)
        ps = state.p
        ax, ay, az, egrav, nf = grav_part(ps.x, ps.y, ps.z, ps.m,
                                          ps.alive, fo["ax"], fo["ay"],
                                          fo["az"])
        return finish(state, fo, ax, ay, az, egrav, nf)

    return step


def _tiered_body(state, layouts, engines, box: Box, cfg: SphConfig):
    """The five tiered pair stages on prebuilt per-tier layouts.

    Stage intermediates CROSS tiers: a fine particle appearing as a
    j-candidate in the coarse frame must carry the xm/kx/cij/divv/alpha
    its OWNER tier computed (its own neighborhood is band-truncated in
    the coarse frame) — exactly the reference's per-stage exchangeHalos
    of intermediates (ve_hydro.hpp:132-205). So after every pair stage
    the per-tier outputs are merged into the particle frame by owner
    mask, and the next stage re-materializes its cm rows from the
    merged frame (to_cm pulls ghosts through layout.src, so no
    intra-frame ghost refresh is needed on this path).

    Gravity is solved once on the particle frame. max_cell_count in the
    diagnostics folds slot overflow + unowned particles + tier-bound h
    clamps + owner-frame misses (an owned particle its tier's layout
    holds no slot for — spatial escape from the tier subbox or cap
    overflow) — any nonzero value is a fail-stop/re-tier signal."""
    from sphexa_tpu.propagator.common import finish_step
    from sphexa_tpu.propagator.ve_pallas import _add_gravity

    ps = state.p
    fo = _tiered_forces(ps, state.dt, layouts, engines, box, cfg)

    merged = dict(ax=fo["ax"], ay=fo["ay"], az=fo["az"],
                  du=fo["du"], maxvsignal=fo["maxvsignal"])
    merged, egrav, nf_trunc = _add_gravity(
        merged, ps.x, ps.y, ps.z, ps.m, ps.alive, box, cfg)

    ps2 = ps.replace(h=fo["h"], alpha=fo["alpha"])
    max_nc = jnp.max(jnp.where(ps.alive, fo["nc_sph"] - 1.0, 0.0))
    new_state, diag = finish_step(
        state, ps2, merged["ax"], merged["ay"], merged["az"],
        merged["du"], merged["maxvsignal"], fo["c"],
        fo["divv"], fo["nc_sph"], box, cfg,
        max_nc=max_nc.astype(jnp.int32),
        max_cell_count=fo["fold"].astype(jnp.int32),
        egrav=egrav, nf_truncated=nf_trunc, rho=fo["rho"], p=fo["p"])
    return new_state, diag


def _tiered_forces(ps, dt_prev, layouts, engines, box: Box,
                   cfg: SphConfig, refresh=None, owned=None,
                   act_pf=None):
    """The five tiered pair stages on a particle FRAME `ps` (any padded
    Particles pytree: the single-chip frame, or a sharded device\'s
    owned+halo extended frame). Hooks for the distributed composition:

      refresh(dict[str, array]) -> dict  re-sends the merged stage
        intermediates\' halo rows from their owner ranks at exactly the
        reference\'s exchangeHalos points (ve_hydro.hpp:132-205);
        identity when None (single chip: to_cm pulls ghosts through
        layout.src, no intra-frame refresh needed).
      owned  bool mask of rows whose outputs this rank owns (halo rows
        excluded from the unowned/clamp accounting); defaults to
        ps.alive.

    When the engines are gated (PallasVE(gated=True)), supercells with
    no local frame rows are skipped — each device of a sharded run pays
    compute only for its own occupancy of the GLOBAL tier grids.

    Returns a dict of particle-frame outputs + the fail-stop `fold`
    (slot overflow + unowned + tier-bound h clamps + owner-frame
    misses)."""
    from sphexa_tpu.sph.eos import eos_ve

    n = ps.n
    h0 = ps.h
    if refresh is None:
        refresh = lambda d: d
    if owned is None:
        owned = ps.alive

    sels = _tier_sels(engines, ps, h0)
    xr, yr, zr = _tier_frame_coords(engines, box, ps)
    bases, valids, gates = [], [], []
    sel_sum = jnp.zeros_like(h0, dtype=bool)
    overflow = 0
    miss = 0
    for ti, (t, pve, intmask, h_bound) in enumerate(engines):
        layout = layouts[ti]
        bases.append(pve.base_rows(layout, xr, yr, zr, ps.h))
        valids.append(layout.valid & intmask)
        if pve.gated:
            # default gate: any local row -> supercell computes. With
            # act_pf (block time-steps): only supercells holding an
            # ACTIVE particle compute; inactive rows are overwritten
            # from the frozen store at the refresh points.
            if act_pf is None:
                act = (layout.valid & intmask).astype(jnp.float32)
            else:
                act = jnp.where(layout.valid & intmask,
                                to_cm(layout, act_pf), 0.0)
            zero_cm = jnp.zeros_like(act)
            gates.append((act, (zero_cm,)))
        else:
            gates.append(None)
        sel_sum = sel_sum | sels[ti]
        overflow = overflow + layout.overflow
        miss = miss + jnp.sum(owned & sels[ti]
                              & (layout.slot_of >= t.grid.n_slots))
    unowned = jnp.sum(owned & ~sel_sum) + miss

    def run_stage(fn):
        """fn(ti, pve, base, cm, gate) -> dict of cm outputs; returns
        the owner-merged particle-frame dict."""
        merged = None
        for ti, (t, pve, intmask, h_bound) in enumerate(engines):
            l = layouts[ti]
            cm = lambda f, fill=0.0, l=l: to_cm(l, f, fill)
            out = fn(ti, pve, bases[ti], cm, gates[ti])
            pf = {k: from_cm(l, v, n, fill)
                  for k, (v, fill) in out.items()}
            if merged is None:
                merged = pf
            else:
                merged = {k: jnp.where(sels[ti], pf[k], merged[k])
                          for k in pf}
        return merged

    # ---- stage 1: fused nc / h-iteration / xmass ----
    def s_xmass(ti, pve, base, cm, gate):
        xm, h_new, nc, nonconv = pve.xmass_h(base, cm(ps.m), gate=gate)
        h_new = jnp.where(valids[ti], h_new, base[3])
        return dict(xm=(xm, 1.0), h=(h_new, 1.0), nc=(nc, 0.0),
                    nonconv=(nonconv, 0.0))

    st1 = run_stage(s_xmass)
    nc_pf, nonconv_pf = st1["nc"], st1["nonconv"]
    # owner clamp at the tier grid's support bound (count + clamp;
    # re-tier at the host boundary, like main.py's re-grid). Under BDT
    # gating only ACTIVE rows count: an inactive row sharing a
    # supercell with an active one gets a recomputed (uncommitted) h
    # here that the freeze refresh discards at the merge point — its
    # committed h was clamp-checked at its own kick (found by the
    # fold_parts decomposition: 72 phantom clamps from rung-2 fringe
    # rows inside rung-0 supercells)
    h_pf = st1["h"]
    committed = owned if act_pf is None else owned & (act_pf > 0.5)
    clamped = 0
    for ti, (t, pve, intmask, h_bound) in enumerate(engines):
        clamped = clamped + jnp.sum(committed & sels[ti]
                                    & (h_pf > h_bound))
        h_pf = jnp.where(sels[ti], jnp.minimum(h_pf, h_bound), h_pf)
    h_pf = jnp.where(ps.alive, h_pf, h0)
    r1 = refresh(dict(h=h_pf, xm=st1["xm"]))
    h_pf, xm_pf = r1["h"], r1["xm"]
    # rebuild base rows with the merged h (j-side h must be the
    # owner-adapted value in every frame)
    for ti in range(len(engines)):
        hcm = to_cm(layouts[ti], h_pf, fill=1.0)
        b = bases[ti]
        bases[ti] = [b[0], b[1], b[2], hcm, b[4]]
    nc_sph_pf = nc_pf + 1.0

    # ---- stage 2: VE normalization kx + grad-h ----
    st2 = run_stage(lambda ti, pve, base, cm, gate: dict(
        zip(("kx", "gradh"),
            ((v, 1.0) for v in pve.gradh(base, cm(ps.m), cm(xm_pf),
                                         gate=gate)))))
    # kx/gradh refreshed BEFORE the EOS so halo/frozen rows feed it
    # consistent inputs (the EOS is then recomputed elementwise from
    # the refreshed inputs + the CURRENT temp — the reference/BDT
    # semantics: dependent inputs frozen, EOS follows the drifted temp)
    r2a = refresh(dict(kx=st2["kx"], gradh=st2["gradh"]))
    kx_pf, gradh_pf = r2a["kx"], r2a["gradh"]

    # ---- EOS: elementwise on the particle frame ----
    rho_pf, p_pf, c_pf, prho_pf = eos_ve(ps.temp, ps.m, kx_pf, xm_pf,
                                         gradh_pf, cfg.mui, cfg.gamma)
    rho_pf = jnp.where(ps.alive, rho_pf, 1.0)
    c_pf = jnp.where(ps.alive, c_pf, 1.0)
    prho_pf = jnp.where(ps.alive, prho_pf, 0.0)
    r2 = refresh(dict(prho=prho_pf, c=c_pf, rho=rho_pf))
    prho_pf, c_pf, rho_pf = r2["prho"], r2["c"], r2["rho"]

    # ---- stage 3: IAD + divv/curlv ----
    def s_iad(ti, pve, base, cm, gate):
        cij, divv, curlv, gradv = pve.iad_divv(
            base, cm(kx_pf, 1.0), cm(xm_pf, 1.0), cm(ps.vx),
            cm(ps.vy), cm(ps.vz), gate=gate)
        out = {f"c{k}": (cij[k], 0.0) for k in range(6)}
        out.update(divv=(divv, 0.0), curlv=(curlv, 0.0))
        out.update({f"g{k}": (gradv[k], 0.0) for k in range(6)})
        return out

    st3 = run_stage(s_iad)
    r3 = refresh({f"c{k}": st3[f"c{k}"] for k in range(6)}
                 | dict(divv=st3["divv"]))
    cij_pf = tuple(r3[f"c{k}"] for k in range(6))
    divv_pf, curlv_pf = r3["divv"], st3["curlv"]
    gradv_pf = tuple(st3[f"g{k}"] for k in range(6))

    # ---- stage 4: AV switches ----
    def s_av(ti, pve, base, cm, gate):
        alpha = pve.av_switches(
            base, cm(c_pf, 1.0), cm(kx_pf, 1.0), cm(xm_pf, 1.0),
            cm(divv_pf), cm(ps.vx), cm(ps.vy), cm(ps.vz),
            tuple(cm(c6) for c6 in cij_pf), cm(ps.alpha), dt_prev,
            gate=gate)
        alpha = jnp.where(valids[ti], alpha,
                          to_cm(layouts[ti], ps.alpha))
        return dict(alpha=(alpha, 0.0))

    alpha_pf = run_stage(s_av)["alpha"]
    alpha_pf = jnp.where(ps.alive, alpha_pf, ps.alpha)
    alpha_pf = refresh(dict(alpha=alpha_pf))["alpha"]

    # ---- stage 5: momentum + energy ----
    def s_mom(ti, pve, base, cm, gate):
        kw = {}
        if cfg.av_clean:
            eta = jnp.cbrt(32.0 * jnp.pi / 3.0
                           / jnp.maximum(cm(nc_sph_pf, 1.0), 1.0))
            kw = dict(gradv=tuple(cm(g) for g in gradv_pf),
                      eta_crit_cm=eta)
        ax, ay, az, du, mvs = pve.momentum(
            base, cm(ps.vx), cm(ps.vy), cm(ps.vz), cm(c_pf, 1.0),
            cm(prho_pf), cm(rho_pf, 1.0), cm(xm_pf, 1.0),
            cm(alpha_pf), cm(ps.m), tuple(cm(c6) for c6 in cij_pf),
            gate=gate, **kw)
        return dict(ax=(ax, 0.0), ay=(ay, 0.0), az=(az, 0.0),
                    du=(du, 0.0), mvs=(mvs, 0.0))

    st5 = run_stage(s_mom)

    return dict(ax=st5["ax"], ay=st5["ay"], az=st5["az"], du=st5["du"],
                maxvsignal=st5["mvs"], h=h_pf, alpha=alpha_pf, c=c_pf,
                divv=divv_pf, curlv=curlv_pf, nc_sph=nc_sph_pf,
                rho=rho_pf, p=p_pf, kx=kx_pf, xm=xm_pf,
                nonconv=nonconv_pf,
                # Budgeted clamps (SphConfig.clamp_frac_budget): a
                # bounded population riding a tier's h support bound is
                # the h_cap semantics (vacuum-edge envelopes PREDICTABLY
                # outgrow the top band — queue9/12 2026-08-20: every
                # Evrard-50 fold was pure clamp at ~2.6% of the alive
                # set), not truncated physics: the clamped h keeps every
                # candidate set complete within its tier stencil. Only a
                # clamp population past the budget folds the step
                # (re-tier). Budget base = the OWNED row count (the
                # frame capacity over-counts padding).
                fold=overflow + unowned + jnp.where(
                    clamped > (cfg.clamp_frac_budget
                               * jnp.sum(owned)).astype(jnp.int32),
                    clamped, 0),
                fold_parts=jnp.stack([
                    jnp.asarray(overflow, jnp.int32),
                    jnp.asarray(unowned - miss, jnp.int32),
                    jnp.asarray(miss, jnp.int32),
                    jnp.asarray(clamped, jnp.int32)]))



# ---------------------------------------------------------------------------
# Resident tiered engine: persistent per-tier layouts (the incremental
# focus-tree update analog, reference:
# domain/include/cstone/focus/octree_focus_mpi.hpp:138-176 — the focus
# tree updates in place each iteration instead of rebuilding).
# ---------------------------------------------------------------------------

REBIN_FRAC = 0.95


@jax.tree_util.register_pytree_node_class
class TieredCarry:
    """Carried state of the resident tiered step: the simulation state
    plus the DATA-DEPENDENT per-tier layout rows (src, valid, slot_of,
    overflow — the static ghost maps re-enter as closure constants;
    carrying them as runtime leaves triggers an XLA duplicate-buffer
    executable-reuse failure and wastes HBM), the accumulated drift
    since the last in-graph rebuild, and a rebuild counter."""

    def __init__(self, state, layouts, drift, rebuilds):
        self.state = state
        self.layouts = layouts   # tuple of (src, valid, slot_of, overflow)
        self.drift = drift
        self.rebuilds = rebuilds

    def tree_flatten(self):
        return (self.state, self.layouts, self.drift, self.rebuilds), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _strip_layouts(layouts):
    return tuple((l.src, l.valid, l.slot_of, l.overflow) for l in layouts)


def _unstrip_layouts(engines, slim):
    from sphexa_tpu.ops.cellmajor import attach_static
    return tuple(
        attach_static(t.grid, t.sub, src, valid, slot_of, overflow)
        for (t, _pve, _im, _hb), (src, valid, slot_of, overflow)
        in zip(engines, slim))


def make_ve_step_pallas_tiered_resident(box: Box, tiers, cfg: SphConfig,
                                        interpret: bool = False,
                                        split_gravity: bool | None = None):
    """Persistent-layout tiered VE step. Layouts (the per-tier binning
    sorts — the expensive part of each step at steady state) are CARRIED
    between steps and rebuilt in-graph (lax.cond) only when stale:

      - drift margin: 2*(h_max_t + drift) >= REBIN_FRAC * edge_t for any
        tier t (the ResidentVE criterion per zoom grid — a particle may
        sit up to `drift` away from its binned cell, so the 27-stencil
        stays complete while the margin holds);
      - owner-frame miss: an owned particle without a slot in its tier
        (h crossed a tier boundary into a frame that theta-band-excluded
        it, or it left the tier subbox). A rebuild re-bins the boundary
        crosser; a spatial escapee stays missed and is COUNTED in the
        body's fail-stop fold (max_cell_count), forcing the host-level
        re-tier exactly like a cap overflow.

    split_gravity (default: the SPHEXA_SPLIT_GRAVITY env var): run the
    conv-FMM in its own jitted program python-composed with the SPH
    program — the v5e workaround for the fused Pallas+FMM program
    crashing the TPU worker at scale (queue5/7 logs 2026-08-19; the
    non-resident twin in make_ve_step_pallas_tiered). The step is then
    a plain python callable (not scannable) and the carry is NOT
    donated (three programs share it per step).

    Returns (bind, step): bind(state) -> TieredCarry,
    step(carry) -> (carry, diag); carry.state is the current SimState.
    """
    import os as _os
    engines = _tier_engines(tiers, cfg, interpret)
    edges = [min(t.sub.lx / t.grid.nx, t.sub.ly / t.grid.n,
                 t.sub.lz / t.grid.nz) for t in tiers]
    per = box.periodic
    L = (box.lx, box.ly, box.lz)
    if split_gravity is None:
        split_gravity = (_os.environ.get("SPHEXA_SPLIT_GRAVITY") == "1"
                         and cfg.gravG != 0.0)

    @jax.jit
    def bind(state):
        return TieredCarry(state=state,
                           layouts=_strip_layouts(_build_layouts(
                               engines, box, state.p)),
                           drift=jnp.float32(0.0),
                           rebuilds=jnp.int32(0))

    def _fresh_slim(carry: TieredCarry):
        """(slim, stale): in-graph rebuild of the carried layouts when
        the drift margin is exhausted or an owned slot went missing."""
        ps = carry.state.p
        sels = _tier_sels(engines, ps, ps.h)
        stale = jnp.bool_(False)
        for ti, (t, pve, intmask, h_bound) in enumerate(engines):
            h_max_t = jnp.max(jnp.where(sels[ti], ps.h, 0.0))
            stale = stale | (2.0 * (h_max_t + carry.drift)
                             >= REBIN_FRAC * edges[ti])
            slot_of_t = carry.layouts[ti][2]
            stale = stale | jnp.any(
                sels[ti] & (slot_of_t >= t.grid.n_slots))
        slim = jax.lax.cond(
            stale,
            lambda p: _strip_layouts(_build_layouts(engines, box, p)),
            lambda p: carry.layouts, ps)
        return slim, stale

    def _next_carry(carry, new_state, slim, stale, diag):
        """Drift bookkeeping shared by the fused and split steps."""
        ps = carry.state.p

        # min-image step displacement (positions may fold at the box)
        def mindelta(a, b, axis):
            d = jnp.abs(a - b)
            return jnp.minimum(d, L[axis] - d) if per[axis] else d

        disp2 = (mindelta(new_state.p.x, ps.x, 0) ** 2
                 + mindelta(new_state.p.y, ps.y, 1) ** 2
                 + mindelta(new_state.p.z, ps.z, 2) ** 2)
        step_disp = jnp.sqrt(jnp.max(jnp.where(ps.alive, disp2, 0.0)))
        drift = jnp.where(stale, 0.0, carry.drift) + step_disp
        return TieredCarry(state=new_state, layouts=slim, drift=drift,
                           rebuilds=carry.rebuilds
                           + stale.astype(jnp.int32)), diag

    if not split_gravity:
        def step(carry: TieredCarry):
            slim, stale = _fresh_slim(carry)
            layouts = _unstrip_layouts(engines, slim)
            new_state, diag = _tiered_body(carry.state, layouts,
                                           engines, box, cfg)
            return _next_carry(carry, new_state, slim, stale, diag)

        # donate the carry: the resident frame is replaced wholesale
        # each step, so donation halves peak HBM — and sidesteps an XLA
        # CPU executable-reuse failure ("supplied N buffers but
        # compiled program expected M") hit when a carried-pytree
        # program interleaves with another jitted program (seen on the
        # 8-device virtual CPU test backend, jax 0.9.0)
        return bind, jax.jit(step, donate_argnums=0)

    from sphexa_tpu.propagator.common import finish_step
    from sphexa_tpu.propagator.ve_pallas import _add_gravity

    @jax.jit
    def sph_part(carry: TieredCarry):
        slim, stale = _fresh_slim(carry)
        layouts = _unstrip_layouts(engines, slim)
        state = carry.state
        fo = _tiered_forces(state.p, state.dt, layouts, engines, box,
                            cfg)
        return fo, slim, stale

    @jax.jit
    def grav_part(x, y, z, m, alive, ax, ay, az):
        out = dict(ax=ax, ay=ay, az=az, du=jnp.zeros_like(ax),
                   maxvsignal=jnp.zeros_like(ax))
        out, egrav, nf = _add_gravity(out, x, y, z, m, alive, box, cfg)
        return out["ax"], out["ay"], out["az"], egrav, nf

    @jax.jit
    def finish(carry, fo, slim, stale, ax, ay, az, egrav, nf_trunc):
        state = carry.state
        ps = state.p
        ps2 = ps.replace(h=fo["h"], alpha=fo["alpha"])
        max_nc = jnp.max(jnp.where(ps.alive, fo["nc_sph"] - 1.0, 0.0))
        new_state, diag = finish_step(
            state, ps2, ax, ay, az, fo["du"], fo["maxvsignal"],
            fo["c"], fo["divv"], fo["nc_sph"], box, cfg,
            max_nc=max_nc.astype(jnp.int32),
            max_cell_count=fo["fold"].astype(jnp.int32),
            egrav=egrav, nf_truncated=nf_trunc, rho=fo["rho"],
            p=fo["p"])
        return _next_carry(carry, new_state, slim, stale, diag)

    def step(carry: TieredCarry):
        fo, slim, stale = sph_part(carry)
        ps = carry.state.p
        ax, ay, az, egrav, nf = grav_part(ps.x, ps.y, ps.z, ps.m,
                                          ps.alive, fo["ax"], fo["ay"],
                                          fo["az"])
        return finish(carry, fo, slim, stale, ax, ay, az, egrav, nf)

    return bind, step
