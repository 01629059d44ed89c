"""Cell-major padded particle layout — the TPU fast-path data structure.

The reference walks octrees per kernel (find_neighbors.cuh); the XLA
fallback here gathers [N, K] neighbor lists. Both are gather-bound. This
layout removes gathers from the hot loop entirely:

  - the search grid gets one ghost-cell layer per side; ghost cells hold
    *pre-shifted copies* of the wrapped interior cells, so pair kernels
    need no periodic folding and no wrap logic
  - every cell owns CAP fixed slots; particles are binned by cell and
    parked in slots (overflow is counted and surfaced — bump CAP)
  - per-particle fields are materialized field-major [F, n_cells * CAP]:
    one field per sublane row, slots on lanes — so a Pallas program for
    cell c reads its 27 neighbor blocks as contiguous [F, CAP] tiles
    whose HBM->VMEM streaming the Pallas pipeline double-buffers

The layout is rebuilt once per step (one argsort + O(N) index math);
every SPH pair stage then runs start-to-finish on dense tiles.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sphexa_tpu.config import INDEX_DTYPE
from sphexa_tpu.sfc.box import Box, normalize_coords


@dataclasses.dataclass(frozen=True)
class CMGrid:
    """Static cell-major grid description (hashable).

    n is the interior cell count in y (and x unless nxi is set); nz
    (default n) may differ — the multi-chip z-plane path shards the box
    into z ranges, so each device's local grid is n x n x nz_local; the
    balanced column-range path (propagator/ve_pallas_hilbert.py) gives
    each device a local x-row window, nx_local x n x nz. Row-major ids
    need no power-of-two. cap must be a multiple of 32 (lane tiling;
    cap-64 packs two cells per 128-lane tile)."""
    n: int               # interior cells in y (and x unless nxi)
    cap: int = 128       # particle slots per cell
    nzi: int = 0         # interior cells in z (0 = same as n)
    nxi: int = 0         # interior cells in x (0 = same as n)

    @property
    def nz(self) -> int:
        return self.nzi if self.nzi else self.n

    @property
    def nx(self) -> int:
        return self.nxi if self.nxi else self.n

    @property
    def np_(self) -> int:  # padded cells in y
        return self.n + 2

    @property
    def npx(self) -> int:  # padded cells in x
        return self.nx + 2

    @property
    def npz(self) -> int:  # padded cells in z
        return self.nz + 2

    @property
    def n_cells(self) -> int:
        return self.npx * self.np_ * self.npz

    @property
    def n_slots(self) -> int:
        return self.n_cells * self.cap

    def padded_id(self, cx, cy, cz):
        """Row-major padded cell id from interior coords (adds ghost offset)."""
        return (((cx + 1) * self.np_) + (cy + 1)) * self.npz + (cz + 1)


class CMLayout(NamedTuple):
    src: jnp.ndarray         # [n_slots] original-frame row per slot
    valid: jnp.ndarray       # [n_slots] slot holds a (copy of a) real particle
    interior: jnp.ndarray    # [n_slots] slot belongs to an interior cell
    shift: tuple             # (sx, sy, sz) [n_slots] ghost coordinate shifts
    ghost_pull: jnp.ndarray  # [n_slots] interior source slot (identity inside)
    slot_of: jnp.ndarray     # [N] slot of each original particle (parked rows
                             #     -> n_slots sentinel)
    overflow: jnp.ndarray    # scalar: particles dropped due to CAP overflow


def choose_cm_grid(box: Box, h_max: float, n_global: int,
                   target_occupancy: float = 0.0, cap: int = 128,
                   slack: float = 1.05) -> CMGrid:
    """Pick the interior cell count: as many cells as the 2*h_max search
    radius allows (correctness bound), but no more than needed to keep the
    mean occupancy near target (efficiency bound). target_occupancy=0
    defaults to ~78% of cap (headroom for compression). n is kept even so
    npd = n + 2 is even (cap-64 tiles pack two cells per 128 lanes)."""
    import math

    if target_occupancy <= 0:
        target_occupancy = 0.78 * cap
    L = min(box.lx, box.ly, box.lz)
    n_corr = max(1, int(math.floor(L / (2.0 * h_max * slack))))
    vol_per_cell = target_occupancy * (box.lx * box.ly * box.lz) / max(n_global, 1)
    cell_occ = vol_per_cell ** (1.0 / 3.0)
    n_occ = max(1, int(math.ceil(L / cell_occ)))
    n = min(n_corr, max(n_occ, 1))
    if n > 1 and n % 2:
        n -= 1 if n_corr <= n else -1
        n = min(n, n_corr)
    return CMGrid(n=max(n, 1), cap=cap)


def legal_zgroup(npz: int, cap: int, max_lanes: int = 1024) -> int:
    """Largest z-supercell size Z in (8,6,4,3,2,1) such that Z divides the
    padded z extent, Z*cap tiles to full 128-lane vregs — the geometry
    contract of ops/pallas_ve.make_cell_pair_call — and Z*cap stays
    within `max_lanes`. Returns 0 when no such Z exists (that
    (grid, cap) pair cannot run on the Pallas engine).

    max_lanes bounds the kernel's scoped-VMEM stack, which scales with
    the supercell lane width (27 j-blocks + 9 three-block run concats,
    all [fj, Z*cap]). 1024 lanes (= the long-proven cap-64 x Z-8 /
    cap-128 x Z-8 working set) keeps the momentum kernel under the
    64 MiB scoped limit; the unbudgeted Z=8 pick at cap 320/384 built
    108/122 MiB stacks and failed AOT compilation on the v5e
    (artifacts/tpu_queue.log 2026-08-19). A cap above max_lanes is
    allowed at Z=1 when it tiles (the caller's choice to run that
    deep)."""
    best = 0
    for z in (8, 6, 4, 3, 2, 1):
        if npz % z == 0 and (z * cap) % 128 == 0:
            if best == 0:
                best = z          # largest legal, ignoring the budget
            if z * cap <= max_lanes:
                return z
    # every legal Z exceeds the budget (cap itself > max_lanes):
    # return the smallest legal Z instead of refusing to run
    if best:
        for z in (1, 2, 3, 4, 6, 8):
            if npz % z == 0 and (z * cap) % 128 == 0:
                return z
    return 0


def max_cell_count(grid: CMGrid, box: Box, xs, ys, zs) -> int:
    """Host-side: the largest per-cell particle count when binning the
    given (alive) positions into `grid` — the minimum viable slot cap."""
    from sphexa_tpu.util.native import max_cell_count_native
    r = max_cell_count_native(xs, ys, zs, box, grid.nx, grid.n, grid.nz)
    if r is not None:
        return r
    ix = np.clip(((np.asarray(xs) - box.xmin) / box.lx * grid.nx).astype(int),
                 0, grid.nx - 1)
    iy = np.clip(((np.asarray(ys) - box.ymin) / box.ly * grid.n).astype(int),
                 0, grid.n - 1)
    iz = np.clip(((np.asarray(zs) - box.zmin) / box.lz * grid.nz).astype(int),
                 0, grid.nz - 1)
    cnt = np.bincount((ix * grid.n + iy) * grid.nz + iz,
                      minlength=grid.nx * grid.n * grid.nz)
    return int(cnt.max())


def choose_cap_and_grid(box: Box, h_eff: float, n_global: int, xs, ys, zs,
                        cap_min: int = 64, cap_max: int = 1024,
                        headroom: int = 0):
    """Jointly pick (cap, grid) for the Pallas cell-pair engine.

    Scans even interior resolutions n from the 2*h_eff correctness bound
    downward; for each, the realized max cell count (+headroom slots for
    drift) sets the minimal cap, rounded up to a multiple of 32 and then
    to the nearest cap with a legal z-supercell for that grid's npz
    (make_cell_pair_call's lane-tiling contract). Returns the candidate
    minimizing streamed pair-lane cost ~ n_cells * cap^2 — this keeps
    uniform cases at shallow caps and lets clustered cases (Evrard) keep
    the fine grid with a deep cap instead of coarsening. Raises if
    nothing fits below cap_max (pathological clustering)."""
    import math

    # A (grid, cap) is VMEM-safe only when every j-window offset AND
    # every center slice is 128-lane aligned: cap % 128 == 0, or
    # exactly cap == 64 under the parity-4 window scheme of
    # pallas_ve.make_cell_pair_call (measured working point: windows
    # are two full vregs, centers alternate vreg halves). Any other
    # cap % 64 == 0 (96, 192, 320, ...) puts CENTER slices at
    # half-vreg offsets (1.5, 2.5 vregs) — Mosaic relayouts then blow
    # the scoped-VMEM stack (observed: cap=96 n=26 OOM at 30.9 MB with
    # a 16 MB limit; cap=192 n=2 OOM at 114 MB with a 64 MB limit,
    # both v5e).
    aligned = _cap_aligned

    L = min(box.lx, box.ly, box.lz)
    n_corr = max(2, int(math.floor(L / (2.0 * h_eff * 1.05))))
    best = None
    # odd n is legal too (cap 128 tiles with z=3 when npz is odd); the
    # cost metric naturally prefers even-n cap-64 grids when they fit
    for n in range(n_corr, 1, -1):
        g0 = CMGrid(n=n)
        need = max(cap_min, max_cell_count(g0, box, xs, ys, zs) + headroom)
        cap = int(np.ceil(need / 64) * 64)
        while cap <= cap_max and not aligned(g0, cap):
            cap += 64
        if cap > cap_max:
            continue
        g = CMGrid(n=n, cap=cap)
        cost = g.n_cells * cap * cap
        if best is None or cost < best[0]:
            best = (cost, cap, g)
    if best is None:
        raise ValueError(
            f"no (cap, grid) with a legal z-group fits these positions "
            f"below cap_max={cap_max}")
    return best[1], best[2]


def choose_grid_with_hcap(box: Box, n_global: int, xs, ys, zs,
                          cap_max: int = 128, headroom: int = 8,
                          margin: float = 1.08):
    """(cap, grid, h_cap): the COARSEST interior resolution whose
    realized occupancy (+headroom) fits a legal aligned cap <= cap_max,
    plus the bounded smoothing length that grid supports.

    This is the deep-contrast companion of `choose_cap_and_grid`: when
    the realized h_max forces a grid so coarse that dense cells exceed
    the structural cap ceiling (the v5e Mosaic compile wall at cap 256,
    artifacts/tpu_queue8.log), the way back INSIDE the proven envelope
    is to bound h instead of deepening the cap — SphConfig.h_cap set to
    the returned value keeps every particle's 2h support within the
    27-stencil of this grid (2 * h_cap * margin <= cell_edge, with
    `margin` also covering the resident engine's drift-rebin slack).
    Only particles whose controller h exceeds h_cap (rarefied cavities/
    envelopes) are affected; the caller should check the clamped
    fraction against its physics budget. Scans n upward (coarse ->
    fine), so the first feasible grid maximizes h_cap and therefore
    minimizes clamping. Raises ValueError if nothing fits below
    cap_max (pathological clustering at every resolution).

    margin trades clamp population against rebin cadence: 1.08 leaves
    ~3% stencil slack beyond the hard 2h bound plus a thin drift
    budget (the resident engine then rebins nearly every step — an
    in-graph lax.cond, acceptable), while 1.15 once pushed the Noh
    h_cap a hair BELOW the bulk h0 and would have clamped 75% of
    particles (queue14 2026-08-20) where 1.08 clamps only the
    nc-starved corner tail."""
    import math

    L = min(box.lx, box.ly, box.lz)
    n_max = max(4, int(math.ceil((4.0 * max(n_global, 1)) ** (1.0 / 3.0))))
    for n in range(2, n_max + 1):
        g0 = CMGrid(n=n)
        need = max(64, max_cell_count(g0, box, xs, ys, zs) + headroom)
        cap = int(np.ceil(need / 64) * 64)
        while cap <= cap_max and not _cap_aligned(g0, cap):
            cap += 64
        if cap > cap_max:
            continue
        g = CMGrid(n=n, cap=cap)
        edge = min(box.lx / g.nx, box.ly / g.n, box.lz / g.nz)
        return cap, g, edge / (2.0 * margin)
    raise ValueError(
        f"no occupancy-feasible grid with cap <= {cap_max} at any "
        f"resolution up to n={n_max}")


def _cap_aligned(g0: CMGrid, cap: int) -> bool:
    """The VMEM-safe (grid, cap) alignment contract of
    choose_cap_and_grid's `aligned` (see its docstring for the measured
    failure modes): cap % 128 == 0, or exactly 64 under even parity-4
    windows."""
    zg = legal_zgroup(g0.npz, cap)
    if zg == 0:
        return False
    if cap % 128 == 0:
        return True
    return cap == 64 and zg % 2 == 0 and g0.nz % 2 == 0


def interior_mask(grid: CMGrid) -> jnp.ndarray:
    """Static bool [n_slots]: slot belongs to an interior (non-ghost) cell."""
    cx, cy, cz = _cell_coords_all(grid)
    n, nz, nx = grid.n, grid.nz, grid.nx
    cell_int = ((cx >= 1) & (cx <= nx) & (cy >= 1) & (cy <= n)
                & (cz >= 1) & (cz <= nz))
    return jnp.asarray(np.repeat(cell_int, grid.cap))


def _cell_coords_all(grid: CMGrid):
    """Integer coords (padded frame) of every padded cell, as numpy consts."""
    npd, npz = grid.np_, grid.npz
    ids = np.arange(grid.n_cells)
    cz = ids % npz
    cy = (ids // npz) % npd
    cx = ids // (npz * npd)
    return cx, cy, cz


class GhostStatic(NamedTuple):
    """The data-independent part of a CMLayout — fixed per (grid, box):
    interior mask, ghost pull indices, fillability, coordinate shifts.
    Numpy arrays; embedded as constants wherever they are traced."""
    interior: np.ndarray
    fillable: np.ndarray
    ghost_pull: np.ndarray
    shift_x: np.ndarray
    shift_y: np.ndarray
    shift_z: np.ndarray


def ghost_static(grid: CMGrid, box: Box) -> GhostStatic:
    """Ghost-cell pull maps and coordinate shifts (see build_layout)."""
    n, nzc, nxc, cap, npd = grid.n, grid.nz, grid.nx, grid.cap, grid.np_
    cx, cy, cz = _cell_coords_all(grid)  # padded coords, numpy
    is_interior_cell = ((cx >= 1) & (cx <= nxc) & (cy >= 1) & (cy <= n)
                        & (cz >= 1) & (cz <= nzc))
    px, py, pz = box.periodic

    def wrap(c, periodic, nd, last):
        # padded coord -> source padded coord + box-length shift count
        if periodic:
            shift = np.where(c == 0, 1, np.where(c == last - 1, -1, 0))
        else:
            shift = np.zeros_like(c)  # non-periodic ghosts stay empty
        return c + shift * nd, shift

    sxc, shx = wrap(cx, px, nxc, grid.npx)
    syc, shy = wrap(cy, py, n, npd)
    szc, shz = wrap(cz, pz, nzc, grid.npz)
    src_cell = (sxc * npd + syc) * grid.npz + szc
    # ghost cell is fillable only if all out-of-range dims are periodic
    fillable = (((cx >= 1) & (cx <= nxc)) | px) \
        & (((cy >= 1) & (cy <= n)) | py) & (((cz >= 1) & (cz <= nzc)) | pz)

    lane = np.arange(cap)
    ghost_pull_np = (np.repeat(src_cell, cap) * cap
                     + np.tile(lane, grid.n_cells)).astype(np.int32)
    return GhostStatic(
        interior=np.repeat(is_interior_cell, cap),
        fillable=np.repeat(fillable, cap),
        ghost_pull=ghost_pull_np,
        shift_x=np.repeat(-shx * box.lx, cap).astype(np.float32),
        shift_y=np.repeat(-shy * box.ly, cap).astype(np.float32),
        shift_z=np.repeat(-shz * box.lz, cap).astype(np.float32))


def attach_static(grid: CMGrid, box: Box, src, valid, slot_of,
                  overflow) -> CMLayout:
    """Rebuild a full CMLayout from its data-dependent rows plus the
    static ghost maps — used by engines that CARRY layouts between
    steps (only src/valid/slot_of/overflow ride the carry; the static
    rows re-enter as constants, keeping duplicate-buffer pytrees out
    of the jit signature)."""
    gs = ghost_static(grid, box)
    return CMLayout(src=src, valid=valid,
                    interior=jnp.asarray(gs.interior),
                    shift=(jnp.asarray(gs.shift_x), jnp.asarray(gs.shift_y),
                           jnp.asarray(gs.shift_z)),
                    ghost_pull=jnp.asarray(gs.ghost_pull),
                    slot_of=slot_of, overflow=overflow)


def build_layout(grid: CMGrid, box: Box, x, y, z, alive=None) -> CMLayout:
    N = x.shape[0]
    n = grid.n
    nzc = grid.nz
    nxc = grid.nx
    cap = grid.cap
    npd = grid.np_

    nx, ny, nz = normalize_coords(box, x, y, z)
    ix = jnp.minimum((nx * nxc).astype(jnp.int32), nxc - 1)
    iy = jnp.minimum((ny * n).astype(jnp.int32), n - 1)
    iz = jnp.minimum((nz * nzc).astype(jnp.int32), nzc - 1)
    cid = grid.padded_id(ix, iy, iz)
    if alive is not None:
        cid = jnp.where(alive, cid, grid.n_cells)  # park dead rows past the end

    order = jnp.argsort(cid).astype(INDEX_DTYPE)
    cid_sorted = cid[order]
    targets = jnp.arange(grid.n_cells + 1, dtype=cid_sorted.dtype)
    cell_start = jnp.searchsorted(cid_sorted, targets).astype(INDEX_DTYPE)

    rank = jnp.arange(N, dtype=INDEX_DTYPE) - cell_start[jnp.minimum(cid_sorted, grid.n_cells)]
    ok = (rank < cap) & (cid_sorted < grid.n_cells)
    overflow = jnp.sum((rank >= cap) & (cid_sorted < grid.n_cells))
    slot_sorted = jnp.where(ok, cid_sorted * cap + rank, grid.n_slots)

    # slot per original particle
    slot_of = jnp.full((N,), grid.n_slots, INDEX_DTYPE).at[order].set(
        slot_sorted.astype(INDEX_DTYPE))

    # inverse: original row per slot (+1 sentinel row)
    src = jnp.zeros((grid.n_slots + 1,), INDEX_DTYPE).at[slot_sorted].set(
        order, mode="drop")[: grid.n_slots]
    valid = jnp.zeros((grid.n_slots + 1,), bool).at[slot_sorted].set(
        True, mode="drop")[: grid.n_slots]

    # ---- ghost cells: pull from wrapped interior cells with coord shifts ----
    gs = ghost_static(grid, box)
    ghost_pull = jnp.asarray(gs.ghost_pull)
    interior = jnp.asarray(gs.interior)
    fillable_j = jnp.asarray(gs.fillable)

    src = jnp.where(interior, src, src[ghost_pull])
    valid = jnp.where(interior, valid, valid[ghost_pull] & fillable_j)

    return CMLayout(src=src, valid=valid, interior=interior,
                    shift=(jnp.asarray(gs.shift_x), jnp.asarray(gs.shift_y),
                           jnp.asarray(gs.shift_z)),
                    ghost_pull=ghost_pull, slot_of=slot_of, overflow=overflow)


def to_cm(layout: CMLayout, field, fill=0.0):
    """Materialize a per-particle field into the cell-major frame."""
    out = field[layout.src]
    return jnp.where(layout.valid, out, fill)


def positions_cm(layout: CMLayout, x, y, z):
    """Positions with ghost shifts applied (no PBC folds needed after)."""
    sx, sy, sz = layout.shift
    return (to_cm(layout, x) + sx, to_cm(layout, y) + sy,
            to_cm(layout, z) + sz)


def refresh_ghosts(layout: CMLayout, field):
    """Update ghost slots of a cm-frame field after a stage computed new
    interior values (the periodic analog of a halo field refresh)."""
    return jnp.where(layout.interior, field, field[layout.ghost_pull])


def from_cm(layout: CMLayout, field_cm, n: int, fill=0.0):
    """Gather a cm-frame result back to the original particle frame."""
    padded = jnp.concatenate([field_cm, jnp.full((1,), fill, field_cm.dtype)])
    return padded[jnp.minimum(layout.slot_of, field_cm.shape[0])]
