"""Pallas TPU kernels for the VE pair stages over the cell-major layout.

Physics identical to sphexa_tpu/sph/hydro_ve.py (reference:
sph/include/sph/hydro_ve/*_kern.hpp); execution model completely
different — and rebuilt in round 2:

  - One Pallas program per *z-supercell* (Z consecutive cells of one
    column, make_cell_pair_call): the 27 neighbor streams arrive as
    [F, Z*CAP] blocks and each cell consumes its 27-neighborhood as
    nine statically-sliced [CAP, 3*CAP] z-run windows — dense masked
    arithmetic, no gathers, no tree walk, no PBC folds (ghost cells
    carry pre-shifted periodic images). This is the TPU analog of the
    reference's warp-persistent kernels (xmass_gpu.cu).
  - Measured speed-of-light note (TPU v5e): the VPU sustains ~1.4
    TFLOP/s fp32 (bf16 is no faster) and these kernels run at ~1.8-2.3
    TF effective — i.e. at the vector unit's ceiling, not at an
    overhead floor. Gains must come from fewer pair-lanes (cap-64
    cells pack two cells per 128-lane tile: ~1.8x fewer padded lanes
    than cap-128 at equal physics) and from moving reductions to the
    MXU, not from scheduling.
  - Geometry is sqrt-free where possible: the sinc^n kernel is a
    polynomial in v^2 = d^2/h^2, so stages that never need the actual
    distance (xmass, gradh, IAD) skip the sqrt entirely; stages that
    need 1/dist (AV, momentum) use one rsqrt.
  - The h/neighbor-count controller iteration is fused into the xmass
    kernel (candidates are already in VMEM; the mask only depends on
    the i-side h), removing round-1's three standalone nc passes.
  - With SphConfig.mxu_moments (default), the IAD velocity-gradient
    and AV graddivv pair reductions are factored into j-side moment
    matmuls on the MXU (single pass); the cancellation-sensitive tau
    matrix stays in direct h-scaled VPU form (the fp32-stable hybrid).

Self-interaction is INCLUDED in the pair loops and absorbed
analytically (zero in every antisymmetric sum; the +xmi / -3*xmi
constants of xmass/gradh; nc_sph = count) — this removes the per-lane
gid compare entirely. Invalid slots carry FILL_POS positions (distance
overflow masks them); every stage masks its own outputs so all
streamed rows stay finite ("NaN-free frame contract"), which lets the
accumulations run as plain fma instead of NaN-protecting selects.
CAP must be a multiple of 32 (lane tiling).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sphexa_tpu.config import SphConfig
from sphexa_tpu.ops.cellmajor import CMGrid, CMLayout, positions_cm, to_cm
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.sph.kernels import (_DSINC_OVER_V_COEF, _SINC_COEF,
                                    _poly_even, _pow_int, exp_pair,
                                    kernel_3d_k)

# base row indices shared by every stage's J matrix
RX, RY, RZ, RH, RGID = 0, 1, 2, 3, 4
NBASE = 5

FILL_POS = 1e8    # invalid-slot position fill: d2 overflows the support
                  # by ~1e16/h^2 but h-scaled squares stay finite (1e17
                  # risked Inf*0=NaN in folded tile accumulations)
_NEG = -1e30

# Mosaic's default scoped-VMEM (kernel stack) limit is 16 MiB; the
# measured stack of the five pair kernels is ~0.31 MiB * CAP
# (independent of Z: 128->~40, 320->103, 384->108.7 MiB, queue logs
# 2026-08-19), so deep aligned caps need most of the v5e's 128 MiB.
# The limit is an ALLOWANCE Mosaic may also SPEND (scheduling/pipeline
# choices) — a fresh cap-128 binary compiled at a 116 MiB allowance
# crashed the worker on a config that runs fine when compiled at 64
# (queue4 sedov gate 17:57 vs 15:22, 2026-08-19), so the default stays
# at the proven 64 MiB envelope. Deep-cap experiments (cap 384 needs
# its measured 108.7 MiB stack admitted) raise it explicitly via
# SPHEXA_VMEM_LIMIT_MB; Mosaic still checks the true total against the
# chip's 128 MiB at compile time either way.
import os as _os

VMEM_LIMIT_BYTES = int(_os.environ.get("SPHEXA_VMEM_LIMIT_MB", "64")) << 20

def _iblock():
    """i-row block size for deep-cap kernels: bodies process the center
    in IB-lane sub-blocks so the Mosaic kernel stack (~0.31 MiB/i-row)
    is bounded at IB rows for any slot cap. 128 = one full vreg of
    lanes (the proven cap-128 stack is ~40 MiB at the 64 MiB
    allowance). Read per-build so tests can override."""
    return int(_os.environ.get("SPHEXA_IBLOCK", "128"))


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


# --------------------------------------------------------------------------
# column-grid pallas_call builder
# --------------------------------------------------------------------------

def make_cell_pair_call(grid: CMGrid, fj: int, fo: int, body: Callable,
                        fi2: int = 0, interpret: bool = False,
                        zgroup: int = 0, gated: bool = False):
    """Build a pallas_call running `body(center, get_run[, i2]) -> [fo, CAP]`
    over all interior cells.

    One program covers a *z-supercell* of Z consecutive cells of one
    column: the 27 neighbor streams arrive as [fj, Z*CAP] blocks (Z x
    fewer, Z x larger DMAs than per-cell blocks — the DMA-latency floor
    measured ~90 ms/kernel at 1M particles with Z=1), the nine z-run
    concatenations are shared by the Z cells, and the body is unrolled
    Z times (compile cost scales with Z, not with the grid size).
    Z must divide npd = n + 2; zgroup=0 picks the largest of 8/6/4/3/2/1
    that does. Supercells at the column ends compute garbage into the
    z-ghost slots — harmless, every consumer ghost-refreshes first."""
    CAP = grid.cap
    npd = grid.np_
    npz = grid.npz
    n = grid.n
    if zgroup == 0:
        from sphexa_tpu.ops.cellmajor import legal_zgroup
        zgroup = legal_zgroup(npz, CAP)
        if zgroup == 0:
            raise ValueError(
                f"no z-supercell size divides npz={npz} while tiling "
                f"cap={CAP} to 128 lanes; pick cap with "
                f"cellmajor.choose_cap_and_grid (cap%%64==0 with even nz "
                f"always works)")
    Z = zgroup
    assert npz % Z == 0 and (Z * CAP) % 128 == 0, (Z, CAP)
    IBLOCK = _iblock()
    nzb = npz // Z            # z-blocks per column
    BW = Z * CAP              # lane width of one block

    def parts(c):
        t = jax.lax.rem(c, nzb)
        cy = jax.lax.rem(jax.lax.div(c, nzb), n)
        cx = jax.lax.div(c, n * nzb)
        return cx, cy, t

    def jmap(c, dx, dy, k):
        cx, cy, t = parts(c)
        tk = jnp.clip(t + k, 0, nzb - 1)   # clamped: end windows unused
        return (0, ((cx + 1 + dx) * npd + (cy + 1 + dy)) * nzb + tk)

    in_specs = [
        pl.BlockSpec((fj, BW),
                     functools.partial(jmap, dx=dx, dy=dy, k=k),
                     memory_space=pltpu.VMEM)
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) for k in (-1, 0, 1)
    ]

    def own_map(c):
        cx, cy, t = parts(c)
        return (0, ((cx + 1) * npd + (cy + 1)) * nzb + t)

    if fi2:
        in_specs.append(pl.BlockSpec((fi2, BW), own_map,
                                     memory_space=pltpu.VMEM))
    if gated:
        # per-slot activity flags + previous outputs: inactive supercells
        # skip the pair compute entirely and keep the frozen values (the
        # TPU analog of the reference's active-rung-only traversal,
        # ve_hydro_bdt.hpp:224-289)
        in_specs.append(pl.BlockSpec((8, BW), own_map,
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((fo, BW), own_map,
                                     memory_space=pltpu.VMEM))
    out_specs = pl.BlockSpec((fo, BW), own_map, memory_space=pltpu.VMEM)

    def kernel(*refs):
        jrefs = refs[:27]
        k = 27
        i2ref = refs[k] if fi2 else None
        k += 1 if fi2 else 0
        act_ref = refs[k] if gated else None
        prev_ref = refs[k + 1] if gated else None
        oref = refs[-1]

        def compute():
            # nine 3-block z-runs, shared by the Z cells of the supercell
            runs = [jnp.concatenate(
                [jrefs[3 * g][...], jrefs[3 * g + 1][...],
                 jrefs[3 * g + 2][...]], axis=1) for g in range(9)]
            own = runs[4]   # own column: center blocks at lanes [BW, 2BW)
            outs = []
            # Window geometry: when CAP is a half-vreg (64 lanes), the
            # natural 3-cell window [t-1, t+2) is 192 lanes at 64-lane
            # offsets — Mosaic pays half-masked vregs + relayout shifts
            # on every access (measured ~2.5x lane-throughput loss vs
            # aligned tiles). Instead use parity-dependent 4-cell
            # windows: even cells read [t-2, t+2), odd cells [t-1, t+3)
            # — every window is 2*128 lanes at 128-aligned offsets.
            # Coverage holds because the cell edge is >= the 2h search
            # radius (down/up reach >= one cell on each side); windows
            # stay inside the padded column when nz is even.
            par4 = (CAP % 128 != 0 and (2 * CAP) % 128 == 0
                    and Z % 2 == 0 and grid.nz % 2 == 0)
            # i-row blocking: the body's pair tiles are [i-rows, window]
            # and the measured Mosaic kernel stack grows ~0.31 MiB per
            # i-row (queue logs 2026-08-19) — full-cap bodies cap the
            # engine at ~384 within the v5e's 128 MiB VMEM. Slicing the
            # center into IB-lane sub-blocks bounds the live tile set at
            # IB rows regardless of CAP; the j-windows are already
            # VMEM-resident, so re-streaming them per sub-block costs
            # VPU reads only, no extra HBM traffic. The MXU hybrid
            # bodies stay exact: their _cell_means origin is algebraic
            # (any origin works), it just becomes a per-block mean.
            # IB = CAP for cap <= IBLOCK keeps the proven fast path
            # byte-identical.
            IB = CAP if CAP <= IBLOCK else IBLOCK
            assert CAP % IB == 0, (CAP, IB)
            for j in range(Z):
                if par4:
                    # global parity of cell j == parity of j (Z even)
                    lo = (Z + j - 2) * CAP if j % 2 == 0 else \
                        (Z + j - 1) * CAP
                    width = 4 * CAP
                else:
                    lo = (Z + j - 1) * CAP
                    width = 3 * CAP

                def get_run(g, lo=lo, width=width):
                    return runs[g][:, lo:lo + width]

                cell = []
                for b in range(CAP // IB):
                    off = (Z + j) * CAP + b * IB
                    center = own[:, off:off + IB]
                    if fi2:
                        i0 = j * CAP + b * IB
                        cell.append(body(center, get_run,
                                         i2ref[:, i0:i0 + IB]))
                    else:
                        cell.append(body(center, get_run))
                outs.append(cell[0] if len(cell) == 1
                            else jnp.concatenate(cell, axis=1))
            oref[...] = jnp.concatenate(outs, axis=1)

        if gated:
            flag = jnp.max(act_ref[0, :]) > 0.5

            @pl.when(flag)
            def _():
                compute()

            @pl.when(jnp.logical_not(flag))
            def _():
                oref[...] = prev_ref[...]
        else:
            compute()

    def call(J, I2=None, act=None, prev=None):
        args = [J] * 27 + ([I2] if fi2 else [])
        if gated:
            assert act is not None and prev is not None
            args += [act, prev]
        return pl.pallas_call(
            kernel,
            grid=(grid.nx * n * nzb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((fo, grid.n_slots), jnp.float32),
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(*args)

    return call


def make_column_pair_call(grid: CMGrid, fj: int, fo: int, body: Callable,
                          fi2: int = 0, interpret: bool = False):
    """Build a pallas_call running `body(center, get_run[, i2]) -> [fo, CAP]`
    for every interior cell, one program per interior (x, y) column.
    get_run(g) returns the g-th z-run window [fj, 3*CAP] (g in 0..8);
    center is the cell's own [fj, CAP] block.

    The z-walk is statically unrolled (dynamic lane offsets measured
    ~50x slower through Mosaic relayouts), which multiplies compile
    time by n — use for small grids / after compile caching."""
    CAP = grid.cap
    npd = grid.np_
    n = grid.n
    assert grid.nz == grid.n, "column mode supports cubic grids only"
    COLW = npd * CAP

    def jmap(c, dx, dy):
        return (0, (c // n + 1 + dx) * npd + (c % n + 1 + dy))

    in_specs = [
        pl.BlockSpec((fj, COLW), functools.partial(jmap, dx=dx, dy=dy),
                     memory_space=pltpu.VMEM)
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ]
    own = functools.partial(jmap, dx=0, dy=0)
    if fi2:
        in_specs.append(pl.BlockSpec((fi2, COLW), own,
                                     memory_space=pltpu.VMEM))
    out_specs = pl.BlockSpec((fo, COLW), own, memory_space=pltpu.VMEM)

    def kernel(*refs):
        jcols = refs[:9]
        i2ref = refs[9] if fi2 else None
        oref = refs[-1]
        zero = jnp.zeros((fo, CAP), jnp.float32)
        oref[:, 0:CAP] = zero                     # z-ghost lanes of the
        oref[:, (n + 1) * CAP:] = zero            # output column

        # statically unrolled z-walk: all window offsets are compile-time
        # constants, so Mosaic treats each slice as a zero-cost subview
        # (dynamic lane offsets trigger per-access relayout copies that
        # measured ~50x slower on real hardware)
        for s in range(n):
            off = (s + 1) * CAP
            center = jcols[4][:, off:off + CAP]

            def get_run(g, off=off):
                return jcols[g][:, off - CAP:off + 2 * CAP]

            if fi2:
                out = body(center, get_run, i2ref[:, off:off + CAP])
            else:
                out = body(center, get_run)
            oref[:, off:off + CAP] = out

    def call(J, I2=None):
        args = [J] * 9 + ([I2] if fi2 else [])
        return pl.pallas_call(
            kernel,
            grid=(n * n,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((fo, grid.n_slots), jnp.float32),
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(*args)

    return call


# --------------------------------------------------------------------------
# ghost-refresh kernel: re-derive every ghost slot from its interior source
# (the single-chip analog of the reference's per-stage exchangeHalos,
#  ve_hydro.hpp:132-205) — one memory-speed pass over [F, n_slots]
# --------------------------------------------------------------------------

def make_ghost_refresh(grid: CMGrid, box: Box, nrows: int,
                       xyz_rows=None, interpret: bool = False,
                       refresh_z: bool = True):
    """Refresh all ghost columns and z-ghost lanes of a [nrows, n_slots]
    row stack. xyz_rows=(ix,iy,iz) marks coordinate rows that receive
    the +-L periodic shifts (or the FILL_POS invalidation on open
    boundaries). refresh_z=False leaves the z-ghost lanes untouched —
    the multi-chip path fills them from the neighbor device's edge
    planes via ppermute instead."""
    CAP = grid.cap
    npd = grid.np_
    n = grid.n
    nz = grid.nz
    COLW = grid.npz * CAP
    px_per, py_per, pz_per = box.periodic
    lx, ly, lz = float(box.lx), float(box.ly), float(box.lz)

    def _zlane_consts():
        # built in-kernel (pallas kernels cannot capture array constants)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, COLW), 1)
        lo = lane < CAP
        hi = lane >= (nz + 1) * CAP
        zshift = jnp.where(lo, -lz, jnp.where(hi, lz, 0.0)).astype(
            jnp.float32)
        return zshift, lo | hi

    def _fill_const():
        row = jax.lax.broadcasted_iota(jnp.int32, (nrows, COLW), 0)
        posmask = jnp.zeros((nrows, COLW), bool)
        for r in xyz_rows:
            posmask = posmask | (row == r)
        return jnp.where(posmask, FILL_POS, 0.0).astype(jnp.float32)

    npx = grid.npx
    nxc = grid.nx

    def srcmap(c):
        px = c // npd
        py = c % npd
        wpx = jnp.where(px == 0, nxc, jnp.where(px == npx - 1, 1, px))
        wpy = jnp.where(py == 0, n, jnp.where(py == npd - 1, 1, py))
        return (0, wpx * npd + wpy)

    def kernel(src_ref, oref):
        c = pl.program_id(0)
        px = c // npd
        py = c % npd
        v = src_ref[:, :]
        if refresh_z:
            out = jnp.concatenate(
                [v[:, nz * CAP:(nz + 1) * CAP],  # low z ghost <- cell nz
                 v[:, CAP:(nz + 1) * CAP],       # interior cells unchanged
                 v[:, CAP:2 * CAP]], axis=1)     # high z ghost <- cell 1
        else:
            out = v

        if xyz_rows is not None:
            ix, iy, iz = xyz_rows
            zshift, zghost = _zlane_consts()
            # row-masked adds (Mosaic has no scatter-add on refs)
            row = jax.lax.broadcasted_iota(jnp.int32, (nrows, COLW), 0)
            add = jnp.zeros((nrows, COLW), jnp.float32)
            if px_per:
                sx = jnp.where(px == 0, -lx,
                               jnp.where(px == npx - 1, lx, 0.0))
                add = add + jnp.where(row == ix, jnp.float32(sx), 0.0)
            if py_per:
                sy = jnp.where(py == 0, -ly,
                               jnp.where(py == npd - 1, ly, 0.0))
                add = add + jnp.where(row == iy, jnp.float32(sy), 0.0)
            if pz_per and refresh_z:
                add = add + jnp.where(row == iz, zshift, 0.0)
            out = out + add
            # open/fixed boundaries: those ghosts hold no images
            if not (px_per and py_per):
                bad = jnp.zeros((), bool)
                if not px_per:
                    bad = bad | (px == 0) | (px == npx - 1)
                if not py_per:
                    bad = bad | (py == 0) | (py == npd - 1)
                out = jnp.where(bad, _fill_const(), out)
            if not pz_per and refresh_z:
                out = jnp.where(zghost, _fill_const(), out)
        oref[:, :] = out

    def call(J):
        return pl.pallas_call(
            kernel,
            grid=(npx * npd,),
            in_specs=[pl.BlockSpec((nrows, COLW), srcmap,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nrows, COLW), lambda c: (0, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nrows, grid.n_slots),
                                           jnp.float32),
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(J)

    return call


# --------------------------------------------------------------------------
# in-kernel helpers
# --------------------------------------------------------------------------

def _col(center, row):
    """i-side values as a [CAP, 1] column."""
    return jnp.transpose(center[row:row + 1, :])


def _tc(center):
    """Transpose the whole center block ONCE per cell ([fj, CAP] ->
    [CAP, fj]): every i-side column is then a plain slice. Per-row
    _col transposes inside the window loops are Mosaic relayouts that
    do not get hoisted/CSEd — one bulk transpose replaces them all."""
    return jnp.transpose(center)


def _tcol(tc, row):
    return tc[:, row:row + 1]


def _w_v2(v2, n_w: int):
    """W = sinc(pi v/2)^n as a polynomial in v^2; zero outside support."""
    sinc = _poly_even(v2, _SINC_COEF)
    return jnp.where(v2 < 4.0, _pow_int(sinc, n_w), 0.0)


def _msum(val, mask):
    return jnp.sum(jnp.where(mask, val, 0.0), axis=1, keepdims=True)


def _sum1(val):
    return jnp.sum(val, axis=1, keepdims=True)


def _geo(pos, jr):
    """Displacements and squared distance (sqrt-free prelude).
    `pos` is the (xi, yi, zi) column triple sliced from the
    once-transposed center block."""
    xi, yi, zi = pos
    rx = xi - jr[RX:RX + 1, :]
    ry = yi - jr[RY:RY + 1, :]
    rz = zi - jr[RZ:RZ + 1, :]
    return rx, ry, rz, rx * rx + ry * ry + rz * rz


def _pos(tc):
    return (_tcol(tc, RX), _tcol(tc, RY), _tcol(tc, RZ))


def _pair_mask(d2, hi_inv2):
    """Support mask WITHOUT a self/gid exclusion: self-pairs are kept
    and their contributions absorbed analytically (they are exactly
    zero in every antisymmetric pair sum, and fold into the +xmi /
    -3*xmi constants of xmass/gradh — see each body). Invalid slots
    are excluded by their FILL_POS distance overflow."""
    v2 = d2 * hi_inv2
    return v2, v2 < 4.0


def _oki(xi):
    """i-slot validity from the x column: invalid slots carry FILL_POS
    positions. Every stage masks its own outputs with this, which
    keeps all streamed rows NaN-free (the frame contract that lets
    downstream stages accumulate with plain fma instead of selects)."""
    return xi < 0.5 * FILL_POS


_exp_pair = exp_pair    # shared with the XLA path (sph/kernels.py)


def _cell_means(center, rows):
    """Mean over valid slots of the center cell for each row index —
    the local expansion origin for the MXU moment factorization."""
    vrow = center[RGID:RGID + 1, :] >= 0.0
    nv = jnp.maximum(jnp.sum(vrow.astype(jnp.float32), axis=1,
                             keepdims=True), 1.0)
    return [jnp.sum(jnp.where(vrow, center[r:r + 1, :], 0.0), axis=1,
                    keepdims=True) / nv
            for r in rows]


# --------------------------------------------------------------------------
# stage bodies (each loops over the nine z-run windows, accumulating)
# --------------------------------------------------------------------------

def _xh_body(center, get_run, *, K3d, n_w, cfg: SphConfig):
    """Fused neighbor-count / h-controller iteration / xmass stage.
    h adaptation matches the reference coupled driver
    (sph/include/sph/find_neighbors.hpp:48-56 + kernels.hpp:27-32): the
    mask only depends on the i-side h, so iterating in-kernel over the
    VMEM-resident candidates is exact and costs no extra HBM traffic.
    Outputs [xm, h, nc]."""
    RM = NBASE
    tc = _tc(center)
    hi = _tcol(tc, RH)
    xi, yi, zi = _pos(tc)

    # pair distances depend only on positions: compute the nine
    # [CAP, 3CAP] d2 tiles once and reuse them across every
    # h-controller count pass and the final xmass pass (the candidates
    # are VMEM-resident; re-deriving d2 per pass was pure VPU waste).
    # Self-pairs are INCLUDED (d2 = 0): the in-support count is then
    # nc_sph = nc + 1 directly, and the self weight W(0) = 1 supplies
    # the +mi term of the xmass denominator for free.
    d2s = []
    for g in range(9):
        jr = get_run(g)
        rx = xi - jr[RX:RX + 1, :]
        ry = yi - jr[RY:RY + 1, :]
        rz = zi - jr[RZ:RZ + 1, :]
        d2s.append(rx * rx + ry * ry + rz * rz)

    def count_sph(hi_inv2):
        # accumulate the mask tiles elementwise, reduce across lanes once
        # (a cross-lane reduce costs several elementwise passes on the VPU)
        ncm = 0.0
        for g in range(9):
            ncm = ncm + (d2s[g] * hi_inv2 < 4.0).astype(jnp.float32)
        return jnp.sum(ncm, axis=1, keepdims=True)

    hinv = 1.0 / hi
    nc_sph = count_sph(hinv * hinv)
    ngmin = float(cfg.ng0 // 4)
    for it in range(cfg.h_iter):
        need = (nc_sph < ngmin) | (nc_sph - 1.0 > float(cfg.ngmax))
        h_new = hi * 0.5 * jnp.power(
            1.0 + 1023.0 * float(cfg.ng0) / jnp.maximum(nc_sph, 1.0), 0.1)
        if cfg.h_cap > 0.0:
            # bounded-h clamp (SphConfig.h_cap): the in-kernel grower
            # must respect the same roof as update_h or a rarefied
            # cavity would push h past the 27-stencil support bound
            # mid-step (silently incomplete candidate sets)
            h_new = jnp.minimum(h_new, cfg.h_cap)
        hi = jnp.where(need, h_new, hi)
        hinv = 1.0 / hi
        if it < cfg.h_iter - 1:
            nc_sph = count_sph(hinv * hinv)

    # final pass: count + xmass accumulation with the converged h
    hi_inv2 = hinv * hinv
    ncm = 0.0
    accm = 0.0
    for g in range(9):
        jr = get_run(g)
        v2 = d2s[g] * hi_inv2
        w = _w_v2(v2, n_w)          # internally zero outside support
        accm = accm + w * jr[RM:RM + 1, :]
        ncm = ncm + (v2 < 4.0).astype(jnp.float32)
    nc = jnp.sum(ncm, axis=1, keepdims=True) - 1.0   # self excluded
    acc = jnp.sum(accm, axis=1, keepdims=True)       # includes +mi (self)

    mi = _tcol(tc, RM)
    xm = mi * (hi * hi * hi) / (K3d * acc)
    # h-controller convergence monitor: 1.0 where the final count still
    # violates the [ng0/4, ngmax] window (the reference iterates until
    # converged, find_neighbors.hpp:48; with a fixed h_iter this flag
    # surfaces residual non-convergence in the diagnostics)
    nonconv = ((nc + 1.0 < ngmin)
               | (nc > float(cfg.ngmax))).astype(jnp.float32)
    # frame contract: invalid slots must stream finite, benign values
    # downstream (xm rides as a divisor via volj = xm/kx)
    ok = _oki(xi)
    xm = jnp.where(ok, xm, 1.0)
    nc = jnp.where(ok, nc, 0.0)
    nonconv = jnp.where(ok, nonconv, 0.0)
    return jnp.concatenate(
        [jnp.transpose(xm), jnp.transpose(hi), jnp.transpose(nc),
         jnp.transpose(nonconv)], axis=0)


def _gradh_body(center, get_run, *, K3d, n_w):
    """VE normalization kx + grad-h (ve_def_gradh_kern.hpp:44), sqrt-free:
    v*dW/dv = n sinc^{n-1} v^2 P_d(v^2) needs no distance."""
    RM, RXM = NBASE, NBASE + 1
    tc = _tc(center)
    pos = _pos(tc)
    hi = _tcol(tc, RH)
    hinv = 1.0 / hi
    hi_inv2 = hinv * hinv
    # self-pairs included: W(0) = 1 and v*dW/dv(0) = 0 make the self
    # terms exactly the +xmi / -3*xmi / -3*mi constants of
    # ve_def_gradh_kern.hpp:61-67, so no explicit addition is needed;
    # all accumulations are plain fma (w/vdw are zero outside support)
    kx_m = whomega_m = wrho0_m = 0.0
    for g in range(9):
        jr = get_run(g)
        _, _, _, d2 = _geo(pos, jr)
        v2 = d2 * hi_inv2
        sinc = _poly_even(v2, _SINC_COEF)
        wnm1 = _pow_int(sinc, n_w - 1)
        inside = v2 < 4.0
        w = jnp.where(inside, wnm1 * sinc, 0.0)
        vdw = jnp.where(inside,
                        n_w * wnm1 * (v2 * _poly_even(v2, _DSINC_OVER_V_COEF)),
                        0.0)
        dterh = -(3.0 * w + vdw)
        # accumulate [CAP, 3CAP] tiles; one cross-lane reduce at the end
        kx_m = kx_m + w * jr[RXM:RXM + 1, :]
        whomega_m = whomega_m + dterh * jr[RXM:RXM + 1, :]
        wrho0_m = wrho0_m + dterh * jr[RM:RM + 1, :]
    kx = jnp.sum(kx_m, axis=1, keepdims=True)
    whomega = jnp.sum(whomega_m, axis=1, keepdims=True)
    wrho0 = jnp.sum(wrho0_m, axis=1, keepdims=True)

    mi = _tcol(tc, RM)
    xmi = _tcol(tc, RXM)

    h3inv = hinv * hi_inv2
    kx = kx * K3d * h3inv
    whomega = whomega * K3d * h3inv * hinv
    wrho0 = wrho0 * K3d * h3inv * hinv

    whomega = whomega * mi / xmi + (kx - K3d * xmi * h3inv) * wrho0
    rho = kx * mi / xmi
    gradh = 1.0 + hi / (rho * 3.0) * whomega
    # frame contract: kx rides as a divisor (volj = xm/kx) downstream
    ok = _oki(pos[0])
    kx = jnp.where(ok, kx, 1.0)
    gradh = jnp.where(ok, gradh, 1.0)
    return jnp.concatenate([jnp.transpose(kx), jnp.transpose(gradh)], axis=0)


def _iad_tail(t11, t12, t13, t22, t23, t33, hi):
    det = (t11 * t22 * t33 + 2.0 * t12 * t23 * t13
           - t11 * t23 * t23 - t22 * t13 * t13 - t33 * t12 * t12)
    fac = 1.0 / (det * hi * hi)
    c11 = (t22 * t33 - t23 * t23) * fac
    c12 = (t13 * t23 - t33 * t12) * fac
    c13 = (t12 * t23 - t22 * t13) * fac
    c22 = (t11 * t33 - t13 * t13) * fac
    c23 = (t13 * t12 - t11 * t23) * fac
    c33 = (t11 * t22 - t12 * t12) * fac
    return c11, c12, c13, c22, c23, c33


def _iad_outputs(cij, dVx, dVy, dVz, norm_kx, ok):
    c11, c12, c13, c22, c23, c33 = cij
    divv = norm_kx * (dVx[0] + dVy[1] + dVz[2])
    curlv = norm_kx * jnp.sqrt((dVz[1] - dVy[2]) ** 2
                               + (dVx[2] - dVz[0]) ** 2
                               + (dVy[0] - dVx[1]) ** 2)
    outs = [c11, c12, c13, c22, c23, c33, divv, curlv,
            norm_kx * dVx[0], norm_kx * (dVx[1] + dVy[0]),
            norm_kx * (dVx[2] + dVz[0]), norm_kx * dVy[1],
            norm_kx * (dVy[2] + dVz[1]), norm_kx * dVz[2]]
    # frame contract: invalid centers stream zeros (their tau is
    # singular, so cij/divv would otherwise carry Inf/NaN downstream)
    outs = [jnp.where(ok, o, 0.0) for o in outs]
    outs += [jnp.zeros_like(divv), jnp.zeros_like(divv)]
    return jnp.concatenate([jnp.transpose(o) for o in outs], axis=0)


def _iad_direct_body(center, get_run, *, K3d, n_w):
    """Single-pass direct IAD + divv/curlv (iad_kern.hpp +
    divv_curlv_kern.hpp), all on the VPU; h-scaled tau keeps the 3x3
    inverse fp32-stable. The velocity-gradient reductions
    Q_ab = sum_j w xm_j v_ab,ij r_b do NOT depend on the inverted
    C matrix, so they accumulate in the SAME window pass as tau and the
    C contraction dV_a = -(C Q)_a happens per-cell afterwards —
    halving the window streaming + W evaluations of the old two-pass
    form."""
    RKX, RXM, RVX, RVY, RVZ = (NBASE, NBASE + 1, NBASE + 2, NBASE + 3,
                               NBASE + 4)
    tc = _tc(center)
    pos = _pos(tc)
    hi = _tcol(tc, RH)
    hinv = 1.0 / hi
    hi_inv2 = hinv * hinv
    h3inv = hinv * hi_inv2
    vxi = _tcol(tc, RVX)
    vyi = _tcol(tc, RVY)
    vzi = _tcol(tc, RVZ)

    t11 = t12 = t13 = t22 = t23 = t33 = 0.0
    Q = [[0.0, 0.0, 0.0] for _ in range(3)]   # Q[a][b] += w xmj v_a r_b
    for g in range(9):
        jr = get_run(g)
        rx, ry, rz, d2 = _geo(pos, jr)
        v2 = d2 * hi_inv2
        w = _w_v2(v2, n_w)          # zero outside support; self s=0
        volj = jr[RXM:RXM + 1, :] / jr[RKX:RKX + 1, :]
        wn = (volj * w) * (K3d * h3inv)
        sx = rx * hinv
        sy = ry * hinv
        sz = rz * hinv
        t11 = t11 + sx * sx * wn
        t12 = t12 + sx * sy * wn
        t13 = t13 + sx * sz * wn
        t22 = t22 + sy * sy * wn
        t23 = t23 + sy * sz * wn
        t33 = t33 + sz * sz * wn

        wxm = w * jr[RXM:RXM + 1, :]
        vji = (jr[RVX:RVX + 1, :] - vxi, jr[RVY:RVY + 1, :] - vyi,
               jr[RVZ:RVZ + 1, :] - vzi)
        rr = (rx, ry, rz)
        for a in range(3):
            va = wxm * vji[a]
            for b in range(3):
                Q[a][b] = Q[a][b] + va * rr[b]
    t11, t12, t13, t22, t23, t33 = (
        _sum1(t) for t in (t11, t12, t13, t22, t23, t33))
    Q = [[_sum1(Q[a][b]) for b in range(3)] for a in range(3)]

    cij = _iad_tail(t11, t12, t13, t22, t23, t33, hi)
    c11, c12, c13, c22, c23, c33 = cij
    C = ((c11, c12, c13), (c12, c22, c23), (c13, c23, c33))

    def dv(a):
        return [-(C[b][0] * Q[a][0] + C[b][1] * Q[a][1]
                  + C[b][2] * Q[a][2]) for b in range(3)]
    dVx, dVy, dVz = dv(0), dv(1), dv(2)

    norm_kx = K3d * h3inv / _tcol(tc, RKX)
    return _iad_outputs(cij, dVx, dVy, dVz, norm_kx, _oki(pos[0]))


def _iad_hybrid_body(center, get_run, *, K3d, n_w):
    """Single-pass hybrid IAD: the cancellation-sensitive tau matrix is
    accumulated directly in h-scaled coordinates on the VPU, while the
    first-order velocity-gradient reductions are factored into 16
    cell-centered j-side moments and contracted on the MXU
    ([CAP, 3*CAP] x [3*CAP, 16] per z-run). Centering positions and
    velocities on the cell mean keeps the raw moments fp32-accurate
    (spread ~ a few h instead of box scale)."""
    RKX, RXM, RVX, RVY, RVZ = (NBASE, NBASE + 1, NBASE + 2, NBASE + 3,
                               NBASE + 4)
    tc = _tc(center)
    pos = _pos(tc)
    hi = _tcol(tc, RH)
    hinv = 1.0 / hi
    hi_inv2 = hinv * hinv
    h3inv = hinv * hi_inv2

    ox, oy, oz, ovx, ovy, ovz = _cell_means(
        center, (RX, RY, RZ, RVX, RVY, RVZ))
    oxT, oyT, ozT = (jnp.transpose(o) for o in (ox, oy, oz))
    xib = (pos[0] - oxT, pos[1] - oyT, pos[2] - ozT)
    vic = (_tcol(tc, RVX) - jnp.transpose(ovx),
           _tcol(tc, RVY) - jnp.transpose(ovy),
           _tcol(tc, RVZ) - jnp.transpose(ovz))

    t11m = t12m = t13m = t22m = t23m = t33m = 0.0
    mom = 0.0
    for g in range(9):
        jr = get_run(g)
        rx, ry, rz, d2 = _geo(pos, jr)
        v2 = d2 * hi_inv2
        w = _w_v2(v2, n_w)          # zero outside support; self s=0

        # tau: direct VPU accumulation (h-scaled, fp32-stable); tile
        # accumulators, one cross-lane reduce per component at the end
        volj = jr[RXM:RXM + 1, :] / jr[RKX:RKX + 1, :]
        wn = (volj * w) * (K3d * h3inv)
        sx = rx * hinv
        sy = ry * hinv
        sz = rz * hinv
        t11m = t11m + sx * sx * wn
        t12m = t12m + sx * sy * wn
        t13m = t13m + sx * sz * wn
        t22m = t22m + sy * sy * wn
        t23m = t23m + sy * sz * wn
        t33m = t33m + sz * sz * wn

        # dV moments: j-side columns (O(3*CAP) work), MXU contraction.
        # The frame contract guarantees finite j rows (invalid slots
        # carry xm=1, kx=1, v=0), so w=0 alone kills invalid pairs.
        wm = w
        xjc = jr[RX:RX + 1, :] - ox
        yjc = jr[RY:RY + 1, :] - oy
        zjc = jr[RZ:RZ + 1, :] - oz
        xmj = jr[RXM:RXM + 1, :]
        ux = xmj * (jr[RVX:RVX + 1, :] - ovx)
        uy = xmj * (jr[RVY:RVY + 1, :] - ovy)
        uz = xmj * (jr[RVZ:RVZ + 1, :] - ovz)
        cols = [xmj, xmj * xjc, xmj * yjc, xmj * zjc,
                ux, ux * xjc, ux * yjc, ux * zjc,
                uy, uy * xjc, uy * yjc, uy * zjc,
                uz, uz * xjc, uz * yjc, uz * zjc]
        M = jnp.concatenate(cols, axis=0)  # [16, 3CAP]
        mom = mom + jax.lax.dot_general(
            wm, M, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [CAP, 16]

    t11, t12, t13, t22, t23, t33 = (
        jnp.sum(t, axis=1, keepdims=True)
        for t in (t11m, t12m, t13m, t22m, t23m, t33m))
    cij = _iad_tail(t11, t12, t13, t22, t23, t33, hi)
    c11, c12, c13, c22, c23, c33 = cij

    def mc(k):
        return mom[:, k:k + 1]

    S0 = mc(0)
    S = (mc(1), mc(2), mc(3))

    def dv(base, v_i):
        # F_b = xi_b (U0 - v_i S0) - (U_b - v_i S_b); dV_a = -(C F)_a
        U0 = mc(base)
        F = [xib[b] * (U0 - v_i * S0) - (mc(base + 1 + b) - v_i * S[b])
             for b in range(3)]
        return [-(c11 * F[0] + c12 * F[1] + c13 * F[2]),
                -(c12 * F[0] + c22 * F[1] + c23 * F[2]),
                -(c13 * F[0] + c23 * F[1] + c33 * F[2])]

    dVx = dv(4, vic[0])
    dVy = dv(8, vic[1])
    dVz = dv(12, vic[2])

    norm_kx = K3d * h3inv / _tcol(tc, RKX)
    return _iad_outputs(cij, dVx, dVy, dVz, norm_kx, _oki(pos[0]))


def _av_alpha_tail(ti2, graddivv, vijsignal, divv_i, hi, ci,
                   cfg: SphConfig):
    """Cullen-Dehnen style alpha evolution (av_switches_kern.hpp:45).
    `ti2` is the transposed [CAP, 8] i2 block."""
    alpha_i = ti2[:, 6:7]
    dt = ti2[:, 7:8]
    a_const = hi * hi * graddivv
    alphaloc = jnp.where(divv_i < 0.0,
                         cfg.alphamax * a_const
                         / (a_const + hi * jnp.abs(divv_i) + 0.05 * ci),
                         0.0)
    decay = hi / (cfg.decay_constant * vijsignal)
    alphadot = jnp.where(alphaloc >= cfg.alphamin,
                         (alphaloc - alpha_i) / decay,
                         (cfg.alphamin - alpha_i) / decay)
    alpha = jnp.where(alphaloc >= alpha_i, alphaloc, alpha_i + alphadot * dt)
    return jnp.transpose(alpha)


def _av_vsig_term(vcols, jr, rx, ry, rz, d2, mask, ci):
    """Per-pair signal-velocity tile [CAP, 3CAP]; the caller folds the
    tiles with elementwise max and does ONE cross-lane reduce at the
    end (cross-lane reduces cost several elementwise passes). `vcols`
    is the (vxi, vyi, vzi) column triple (hoisted, not re-transposed
    per window)."""
    RVX, RVY, RVZ = NBASE + 4, NBASE + 5, NBASE + 6
    vx_ij = vcols[0] - jr[RVX:RVX + 1, :]
    vy_ij = vcols[1] - jr[RVY:RVY + 1, :]
    vz_ij = vcols[2] - jr[RVZ:RVZ + 1, :]
    rv = rx * vx_ij + ry * vy_ij + rz * vz_ij
    inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
    return jnp.where(mask & (rv < 0.0),
                     ci + jr[NBASE:NBASE + 1, :] - 3.0 * rv * inv_d, _NEG)


def _av_direct_body(center, get_run, i2, *, K3d, n_w, cfg: SphConfig):
    RC, RKX, RXM, RDIVV = NBASE, NBASE + 1, NBASE + 2, NBASE + 3
    RVX = NBASE + 4
    tc = _tc(center)
    pos = _pos(tc)
    vcols = (_tcol(tc, RVX), _tcol(tc, RVX + 1), _tcol(tc, RVX + 2))
    hi = _tcol(tc, RH)
    hinv = 1.0 / hi
    hi_inv2 = hinv * hinv
    h3inv = hinv * hi_inv2
    ci = _tcol(tc, RC)
    divv_i = _tcol(tc, RDIVV)
    ti2 = jnp.transpose(i2)
    c11i, c12i, c13i, c22i, c23i, c33i = (ti2[:, k:k + 1] for k in range(6))

    vsig_max = _NEG
    gxm = gym = gzm = 0.0
    for g in range(9):
        jr = get_run(g)
        rx, ry, rz, d2 = _geo(pos, jr)
        v2, mask = _pair_mask(d2, hi_inv2)
        vsig_max = jnp.maximum(vsig_max, _av_vsig_term(
            vcols, jr, rx, ry, rz, d2, mask, ci))

        w = _w_v2(v2, n_w) * (K3d * h3inv)   # zero outside support
        termA1 = -(c11i * rx + c12i * ry + c13i * rz) * w
        termA2 = -(c12i * rx + c22i * ry + c23i * rz) * w
        termA3 = -(c13i * rx + c23i * ry + c33i * rz) * w
        volj = jr[RXM:RXM + 1, :] / jr[RKX:RKX + 1, :]
        factor = volj * (divv_i - jr[RDIVV:RDIVV + 1, :])
        gxm = gxm + factor * termA1
        gym = gym + factor * termA2
        gzm = gzm + factor * termA3
    gx, gy, gz = _sum1(gxm), _sum1(gym), _sum1(gzm)

    vsig_max = jnp.max(vsig_max, axis=1, keepdims=True)
    vijsignal = jnp.maximum(vsig_max, 1e-30 * ci)
    graddivv = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    alpha = _av_alpha_tail(ti2, graddivv, vijsignal, divv_i, hi, ci, cfg)
    ok_row = center[RX:RX + 1, :] < 0.5 * FILL_POS
    alpha = jnp.where(ok_row, alpha, 0.0)
    # pad to 8 output rows: [1, n] outputs take a T(1,128) layout whose
    # stores/copies are far slower than T(8,128) on the v5e (iota-select
    # instead of concat: Mosaic cannot legalize a 1-row concat stack)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, alpha.shape[1]), 0)
    return jnp.where(row == 0, jnp.broadcast_to(alpha, (8, alpha.shape[1])),
                     0.0)


def _av_mm_body(center, get_run, i2, *, K3d, n_w, cfg: SphConfig):
    """AV switches with the graddivv reduction factored into 8
    cell-centered moments on the MXU; the per-pair signal-velocity max
    stays on the VPU (max is not a matmul)."""
    RC, RKX, RXM, RDIVV = NBASE, NBASE + 1, NBASE + 2, NBASE + 3
    RVX = NBASE + 4
    tc = _tc(center)
    pos = _pos(tc)
    vcols = (_tcol(tc, RVX), _tcol(tc, RVX + 1), _tcol(tc, RVX + 2))
    hi = _tcol(tc, RH)
    hinv = 1.0 / hi
    hi_inv2 = hinv * hinv
    h3inv = hinv * hi_inv2
    ci = _tcol(tc, RC)
    ti2 = jnp.transpose(i2)
    c11i, c12i, c13i, c22i, c23i, c33i = (ti2[:, k:k + 1] for k in range(6))

    ox, oy, oz, odv = _cell_means(center, (RX, RY, RZ, RDIVV))
    xib = (pos[0] - jnp.transpose(ox),
           pos[1] - jnp.transpose(oy),
           pos[2] - jnp.transpose(oz))
    divv_i = _tcol(tc, RDIVV)
    dvic = divv_i - jnp.transpose(odv)

    vsig_max = _NEG
    mom = 0.0
    for g in range(9):
        jr = get_run(g)
        rx, ry, rz, d2 = _geo(pos, jr)
        v2, mask = _pair_mask(d2, hi_inv2)
        vsig_max = jnp.maximum(vsig_max, _av_vsig_term(
            vcols, jr, rx, ry, rz, d2, mask, ci))

        wm = _w_v2(v2, n_w)          # zero outside support
        volj = jr[RXM:RXM + 1, :] / jr[RKX:RKX + 1, :]
        xjc = jr[RX:RX + 1, :] - ox
        yjc = jr[RY:RY + 1, :] - oy
        zjc = jr[RZ:RZ + 1, :] - oz
        vd = volj * (jr[RDIVV:RDIVV + 1, :] - odv)
        cols = [volj, volj * xjc, volj * yjc, volj * zjc,
                vd, vd * xjc, vd * yjc, vd * zjc]
        M = jnp.concatenate(cols, axis=0)  # [8, 3CAP]
        mom = mom + jax.lax.dot_general(
            wm, M, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [CAP, 8]

    def mc(k):
        return mom[:, k:k + 1]

    S0v = mc(0)
    Sv = (mc(1), mc(2), mc(3))
    D0 = mc(4)
    D = (mc(5), mc(6), mc(7))
    G = [xib[b] * (dvic * S0v - D0) - (dvic * Sv[b] - D[b]) for b in range(3)]
    scale = K3d * h3inv
    gx = -(c11i * G[0] + c12i * G[1] + c13i * G[2]) * scale
    gy = -(c12i * G[0] + c22i * G[1] + c23i * G[2]) * scale
    gz = -(c13i * G[0] + c23i * G[1] + c33i * G[2]) * scale

    vsig_max = jnp.max(vsig_max, axis=1, keepdims=True)
    vijsignal = jnp.maximum(vsig_max, 1e-30 * ci)
    graddivv = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    alpha = _av_alpha_tail(ti2, graddivv, vijsignal, divv_i, hi, ci, cfg)
    ok_row = center[RX:RX + 1, :] < 0.5 * FILL_POS
    alpha = jnp.where(ok_row, alpha, 0.0)
    # pad to 8 output rows: [1, n] outputs take a T(1,128) layout whose
    # stores/copies are far slower than T(8,128) on the v5e (iota-select
    # instead of concat: Mosaic cannot legalize a 1-row concat stack)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, alpha.shape[1]), 0)
    return jnp.where(row == 0, jnp.broadcast_to(alpha, (8, alpha.shape[1])),
                     0.0)


def _momentum_body(center, get_run, *, K3d, n_w, cfg: SphConfig):
    """Momentum + energy (momentum_energy_kern.hpp:65-222) with the
    Atwood-ramped crossed/uncrossed VE terms, pair AV, and (optional)
    the avClean velocity-gradient rv correction (:44-63). Micro-opts vs
    round 1: rho rides as a precomputed row (no per-pair divides for
    rhoj/atwood denominators), the ramp drops the per-pair log (row/col
    log(xm) instead), and one rsqrt replaces sqrt + divide."""
    (RVX, RVY, RVZ, RC, RPRHO, RRHO, RXM, RAL, RM,
     R11, R12, R13, R22, R23, R33) = range(NBASE, NBASE + 15)
    if cfg.av_clean:
        RD11, RD12, RD13, RD22, RD23, RD33, RETA = range(NBASE + 15,
                                                         NBASE + 22)

    tc = _tc(center)
    pos = _pos(tc)
    hi = _tcol(tc, RH)
    hi_inv = 1.0 / hi
    hi_inv2 = hi_inv * hi_inv
    hi3inv = hi_inv * hi_inv2
    c11i = _tcol(tc, R11)
    c12i = _tcol(tc, R12)
    c13i = _tcol(tc, R13)
    c22i = _tcol(tc, R22)
    c23i = _tcol(tc, R23)
    c33i = _tcol(tc, R33)
    vxi = _tcol(tc, RVX)
    vyi = _tcol(tc, RVY)
    vzi = _tcol(tc, RVZ)
    ci = _tcol(tc, RC)
    alpha_i = _tcol(tc, RAL)
    rhoi = _tcol(tc, RRHO)
    rhoi_inv = 1.0 / rhoi
    prhoi = _tcol(tc, RPRHO)
    xmi = _tcol(tc, RXM)
    lxmi = jnp.log(xmi)
    if cfg.av_clean:
        dv_i = [_tcol(tc, r) for r in (RD11, RD12, RD13, RD22, RD23,
                                       RD33)]
        eta_crit = _tcol(tc, RETA)

    mom_x = mom_y = mom_z = 0.0
    energy = 0.0
    a_visc_energy = 0.0
    vsig_max = _NEG
    for g in range(9):
        jr = get_run(g)
        rx, ry, rz, d2 = _geo(pos, jr)
        v2i, mask = _pair_mask(d2, hi_inv2)
        hj_inv = 1.0 / jr[RH:RH + 1, :]        # [1, 3CAP] row reciprocal
        v2j = d2 * (hj_inv * hj_inv)
        # Wi/Wj are zero outside the i-support (w_v2's internal select
        # covers Wi; Wj needs the i-support mask since hj may exceed hi)
        Wi = _w_v2(v2i, n_w) * hi3inv
        Wj = jnp.where(mask, _w_v2(v2j, n_w)
                       * (hj_inv * hj_inv * hj_inv), 0.0)

        termA1_i = -(c11i * rx + c12i * ry + c13i * rz) * Wi
        termA2_i = -(c12i * rx + c22i * ry + c23i * rz) * Wi
        termA3_i = -(c13i * rx + c23i * ry + c33i * rz) * Wi
        termA1_j = -(jr[R11:R11 + 1, :] * rx + jr[R12:R12 + 1, :] * ry
                     + jr[R13:R13 + 1, :] * rz) * Wj
        termA2_j = -(jr[R12:R12 + 1, :] * rx + jr[R22:R22 + 1, :] * ry
                     + jr[R23:R23 + 1, :] * rz) * Wj
        termA3_j = -(jr[R13:R13 + 1, :] * rx + jr[R23:R23 + 1, :] * ry
                     + jr[R33:R33 + 1, :] * rz) * Wj

        vx_ij = vxi - jr[RVX:RVX + 1, :]
        vy_ij = vyi - jr[RVY:RVY + 1, :]
        vz_ij = vzi - jr[RVZ:RVZ + 1, :]
        rv = rx * vx_ij + ry * vy_ij + rz * vz_ij
        inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))

        if cfg.av_clean:
            # avClean rv correction (momentum_energy_kern.hpp:44-63)
            def quad(d11, d12, d13, d22, d23, d33):
                q1 = d11 * rx + d12 * ry + d13 * rz
                q2 = d22 * ry + d23 * rz
                q3 = d33 * rz
                return rx * q1 + ry * q2 + rz * q3

            dmy1 = quad(*dv_i)
            dmy2 = quad(jr[RD11:RD11 + 1, :], jr[RD12:RD12 + 1, :],
                        jr[RD13:RD13 + 1, :], jr[RD22:RD22 + 1, :],
                        jr[RD23:RD23 + 1, :], jr[RD33:RD33 + 1, :])
            dist = d2 * inv_d
            eta_ab = dist * jnp.minimum(hi_inv, hj_inv)
            eta_diff = 5.0 * (eta_ab - eta_crit)
            dmy3 = jnp.where(eta_ab < eta_crit,
                             jnp.exp(-eta_diff * eta_diff), 1.0)
            A_ab = jnp.where(dmy2 != 0.0,
                             dmy1 / jnp.where(dmy2 != 0.0, dmy2, 1.0), 0.0)
            A_abp1 = 1.0 + A_ab
            phi_ab = 0.5 * dmy3 * jnp.clip(
                4.0 * A_ab / (A_abp1 * A_abp1), 0.0, 1.0)
            rv = rv - phi_ab * (dmy1 + dmy2)

        wij = rv * inv_d
        cj = jr[RC:RC + 1, :]
        csum = ci + cj
        vij_signal = (alpha_i + jr[RAL:RAL + 1, :]) * 0.25 * csum - 2.0 * wij
        # approaching-pair select only: out-of-support garbage rides on
        # termA (= 0 there), so no support mask is needed on visc
        visc = jnp.where(wij < 0.0, -vij_signal * wij, 0.0)

        # d2 > 0 excludes the self-pair (it would contribute ci)
        vsig_ts = jnp.where(mask & (d2 > 0.0), 0.5 * csum - 2.0 * wij, _NEG)
        vsig_max = jnp.maximum(vsig_max, vsig_ts)

        mj = jr[RM:RM + 1, :]
        xmj = jr[RXM:RXM + 1, :]
        rhoj = jr[RRHO:RRHO + 1, :]
        drho = jnp.abs(rhoi - rhoj)
        srho = rhoi + rhoj
        sigma = cfg.ramp * (drho / srho - cfg.atmin)
        lxmj = jnp.log(xmj)
        prod = xmi * xmj
        if cfg.uniform_mass:
            # Equal-mass fast path: clamp sigma to [0, 1] — the branch
            # endpoints xmi^2 / prod are exactly the clamped-exponent
            # values — and evaluate both exp(+-(1-sigma)*dlog) with one
            # short polynomial pair. Valid because equal masses bound
            # the xm contrast by the Atwood window (|arg| <~ 0.5)
            # whenever sigma is interior (momentum_energy_kern.hpp:
            # 117-132 semantics, regrouped).
            sc = jnp.clip(sigma, 0.0, 1.0)
            xarg = (1.0 - sc) * (lxmj - lxmi)
            ep, em = _exp_pair(xarg)
            a_mom = prod * em
            b_mom = prod * ep
        else:
            is_lo = drho < cfg.atmin * srho
            is_hi = drho > cfg.atmax * srho
            # xmi^(2-s) xmj^s = xmi*xmj*(xmj/xmi)^(s-1)
            t = jnp.exp((sigma - 1.0) * (lxmj - lxmi))
            a_mom = jnp.where(is_lo, xmi * xmi,
                              jnp.where(is_hi, prod, prod * t))
            b_mom = jnp.where(is_lo, xmj * xmj,
                              jnp.where(is_hi, prod, prod / t))

        a_visc = (mj * rhoi_inv) * visc        # column reciprocal
        b_visc = (mj / rhoj) * visc            # row-level divide
        a_visc_x = 0.5 * (a_visc * termA1_i + b_visc * termA1_j)
        a_visc_y = 0.5 * (a_visc * termA2_i + b_visc * termA2_j)
        a_visc_z = 0.5 * (a_visc * termA3_i + b_visc * termA3_j)
        a_visc_energy = a_visc_energy + (
            a_visc_x * vx_ij + a_visc_y * vy_ij + a_visc_z * vz_ij)

        energy = energy + mj * a_mom * (vx_ij * termA1_i + vy_ij * termA2_i
                                        + vz_ij * termA3_i)

        mom_i = mj * prhoi * a_mom
        mom_j = mj * jr[RPRHO:RPRHO + 1, :] * b_mom
        mom_x = mom_x + (mom_i * termA1_i + mom_j * termA1_j + a_visc_x)
        mom_y = mom_y + (mom_i * termA2_i + mom_j * termA2_j + a_visc_y)
        mom_z = mom_z + (mom_i * termA3_i + mom_j * termA3_j + a_visc_z)

    mom_x, mom_y, mom_z = _sum1(mom_x), _sum1(mom_y), _sum1(mom_z)
    energy = _sum1(energy)
    a_visc_energy = jnp.maximum(_sum1(a_visc_energy), 0.0)
    maxvsignal = jnp.maximum(
        jnp.max(vsig_max, axis=1, keepdims=True), 0.0)
    du = K3d * (prhoi * energy + 0.5 * a_visc_energy)
    ok = _oki(pos[0])
    outs = [jnp.where(ok, o, 0.0) for o in
            (-K3d * mom_x, -K3d * mom_y, -K3d * mom_z, du, maxvsignal)]
    return jnp.concatenate([jnp.transpose(o) for o in outs], axis=0)


def _momentum_mm_body(center, get_run, *, K3d, n_w, cfg: SphConfig):
    """Momentum + energy with every pair reduction factored into j-side
    moment matmuls on the MXU (the same cell-mean-centered factorization
    as the hybrid IAD/AV bodies, extended to all five momentum-stage
    reductions). Per pair the VPU now only evaluates geometry, the two
    kernel polynomials, the AV signal terms and the Atwood ramp; the
    termA projections and the mom/energy/visc-energy accumulations ride
    a single [5*CAP, 3*CAP] x [3*CAP, 49] contraction per z-run.

    Semantics identical to _momentum_body (momentum_energy_kern.hpp:
    65-222) up to fp32 regrouping:

      mom_a   = sum_j Pi*termA_a_i + Pj*termA_a_j
      energy  = sum_j Ei * sum_a v_a,ij * termA_a_i
      aviscE  = sum_j sum_a (Vi*termA_a_i + Vj*termA_a_j) * v_a,ij

    with termA_a_i = -(sum_b c_ab,i r_b) Wi and r_b/v_ij expanded in
    cell-mean-centered coordinates, so every sum factors into moments
    over {1, x_b, v_a, v_a x_b} and the cij-weighted analogs. The
    avClean rv correction is not factorable (per-pair quadratic ratio);
    cfg.av_clean falls back to the direct body."""
    (RVX, RVY, RVZ, RC, RPRHO, RRHO, RXM, RAL, RM,
     R11, R12, R13, R22, R23, R33) = range(NBASE, NBASE + 15)

    tc = _tc(center)
    pos = _pos(tc)
    hi = _tcol(tc, RH)
    hi_inv = 1.0 / hi
    hi_inv2 = hi_inv * hi_inv
    hi3inv = hi_inv * hi_inv2
    # i-side sanitization: garbage (finite, frame contract) i-rows of
    # invalid slots must not enter the matmul weight rows
    oki = _oki(pos[0])
    ci = jnp.where(oki, _tcol(tc, RC), 1.0)
    alpha_i = jnp.where(oki, _tcol(tc, RAL), 0.0)
    rhoi = jnp.where(oki, _tcol(tc, RRHO), 1.0)
    rhoi_inv = 1.0 / rhoi
    prhoi = jnp.where(oki, _tcol(tc, RPRHO), 0.0)
    xmi = jnp.where(oki, _tcol(tc, RXM), 1.0)
    lxmi = jnp.log(xmi)
    cii = [jnp.where(oki, _tcol(tc, r), 0.0)
           for r in (R11, R12, R13, R22, R23, R33)]

    # cell-mean expansion origin (positions + velocities)
    ox, oy, oz, ovx, ovy, ovz = _cell_means(
        center, (RX, RY, RZ, RVX, RVY, RVZ))
    bic = tuple(jnp.where(oki, _tcol(tc, r) - jnp.transpose(o), 0.0)
                for r, o in ((RX, ox), (RY, oy), (RZ, oz)))
    vic = tuple(jnp.where(oki, _tcol(tc, r) - jnp.transpose(o), 0.0)
                for r, o in ((RVX, ovx), (RVY, ovy), (RVZ, ovz)))

    CAP = center.shape[1]
    # (a, b) index pairs of the symmetric cij rows, in termA row order
    AB = ((0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2),
          (2, 0), (2, 1), (2, 2))
    C6 = {(0, 0): 0, (0, 1): 1, (1, 0): 1, (0, 2): 2, (2, 0): 2,
          (1, 1): 3, (1, 2): 4, (2, 1): 4, (2, 2): 5}

    mom = 0.0
    vsig_max = _NEG
    for g in range(9):
        jr = get_run(g)
        rx, ry, rz, d2 = _geo(pos, jr)
        v2i, mask = _pair_mask(d2, hi_inv2)
        hj_inv = 1.0 / jr[RH:RH + 1, :]
        v2j = d2 * (hj_inv * hj_inv)
        Wi = jnp.where(mask, _w_v2(v2i, n_w) * hi3inv, 0.0)
        Wj = jnp.where(mask, _w_v2(v2j, n_w)
                       * (hj_inv * hj_inv * hj_inv), 0.0)

        vx_ij = _tcol(tc, RVX) - jr[RVX:RVX + 1, :]
        vy_ij = _tcol(tc, RVY) - jr[RVY:RVY + 1, :]
        vz_ij = _tcol(tc, RVZ) - jr[RVZ:RVZ + 1, :]
        rv = rx * vx_ij + ry * vy_ij + rz * vz_ij
        inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
        wij = rv * inv_d
        cj = jr[RC:RC + 1, :]
        csum = ci + cj
        vij_signal = (alpha_i + jr[RAL:RAL + 1, :]) * 0.25 * csum - 2.0 * wij
        visc = jnp.where(mask & (wij < 0.0), -vij_signal * wij, 0.0)
        vsig_ts = jnp.where(mask & (d2 > 0.0), 0.5 * csum - 2.0 * wij, _NEG)
        vsig_max = jnp.maximum(vsig_max, vsig_ts)

        # sanitized j rows (invalid slots carry NaN xm / garbage fields;
        # the matmul path has no post-mask, so NaNs must never enter the
        # weight or moment operands)
        okj = jr[RGID:RGID + 1, :] >= 0.0
        mj = jnp.where(okj, jr[RM:RM + 1, :], 0.0)
        xmj = jnp.where(okj, jr[RXM:RXM + 1, :], 1.0)
        rhoj = jnp.where(okj, jr[RRHO:RRHO + 1, :], 1.0)
        prhoj = jnp.where(okj, jr[RPRHO:RPRHO + 1, :], 0.0)

        # Atwood-ramped crossed/uncrossed VE coefficients
        drho = jnp.abs(rhoi - rhoj)
        srho = rhoi + rhoj
        is_lo = drho < cfg.atmin * srho
        is_hi = drho > cfg.atmax * srho
        sigma = cfg.ramp * (drho / srho - cfg.atmin)
        lxmj = jnp.log(xmj)
        t = jnp.exp((sigma - 1.0) * (lxmj - lxmi))
        prod = xmi * xmj
        a_mom = jnp.where(is_lo, xmi * xmi,
                          jnp.where(is_hi, prod, prod * t))
        b_mom = jnp.where(is_lo, xmj * xmj,
                          jnp.where(is_hi, prod, prod / t))

        # pair weights for the five reduction families
        av2 = (0.5 * mj) * visc
        Vi_w = av2 * rhoi_inv
        Vj_w = av2 / rhoj
        Ei_w = mj * a_mom
        Pi_w = prhoi * Ei_w + Vi_w
        Pj_w = (prhoj * b_mom) * mj + Vj_w
        L = jnp.concatenate([Pi_w * Wi, Pj_w * Wj, Ei_w * Wi,
                             Vi_w * Wi, Vj_w * Wj], axis=0)

        # j-side moment columns (centered, sanitized)
        one = okj.astype(jnp.float32)
        bjc = [jnp.where(okj, jr[r:r + 1, :] - o, 0.0)
               for r, o in ((RX, ox), (RY, oy), (RZ, oz))]
        vjc = [jnp.where(okj, jr[r:r + 1, :] - o, 0.0)
               for r, o in ((RVX, ovx), (RVY, ovy), (RVZ, ovz))]
        cj6 = [jnp.where(okj, jr[r:r + 1, :], 0.0)
               for r in (R11, R12, R13, R22, R23, R33)]
        cols = [one] + bjc + vjc
        cols += [vjc[a] * bjc[b] for a in range(3) for b in range(3)]
        cols += cj6
        cols += [cj6[C6[ab]] * bjc[ab[1]] for ab in AB]
        cols += [cj6[C6[ab]] * vjc[ab[0]] for ab in AB]
        cols += [cj6[C6[ab]] * vjc[ab[0]] * bjc[ab[1]] for ab in AB]
        M = jnp.concatenate(cols, axis=0)  # [49, 3CAP]
        if cfg.mxu_bf16:
            # bf16 streams, fp32 accumulation (SphConfig.mxu_bf16):
            # one MXU pass instead of the 3-6-pass fp32 decomposition
            L = L.astype(jnp.bfloat16)
            M = M.astype(jnp.bfloat16)
        mom = mom + jax.lax.dot_general(
            L, M, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [5CAP, 49]

    SA = mom[0:CAP]
    SB = mom[CAP:2 * CAP]
    SC = mom[2 * CAP:3 * CAP]
    SD = mom[3 * CAP:4 * CAP]
    SE = mom[4 * CAP:5 * CAP]

    def col(S, k):
        return S[:, k:k + 1]

    # ---- i-side momentum: -sum_b c_ab,i * sum_j WA r_b ----
    RA = [bic[b] * col(SA, 0) - col(SA, 1 + b) for b in range(3)]
    momA = [-(cii[C6[(a, 0)]] * RA[0] + cii[C6[(a, 1)]] * RA[1]
              + cii[C6[(a, 2)]] * RA[2]) for a in range(3)]

    # ---- j-side momentum: -sum_j WB sum_b c_ab,j r_b ----
    def UB(a):
        acc = 0.0
        for b in range(3):
            acc = acc + bic[b] * col(SB, 16 + C6[(a, b)]) \
                - col(SB, 22 + 3 * a + b)
        return acc
    momB = [-UB(a) for a in range(3)]
    mom_x = momA[0] + momB[0]
    mom_y = momA[1] + momB[1]
    mom_z = momA[2] + momB[2]

    # ---- energy / i-side visc energy: -sum_ab c_ab,i Q_ab ----
    def QI(S):
        acc = 0.0
        for a, b in AB:
            q = (vic[a] * bic[b] * col(S, 0) - vic[a] * col(S, 1 + b)
                 - bic[b] * col(S, 4 + a) + col(S, 7 + 3 * a + b))
            acc = acc + cii[C6[(a, b)]] * q
        return -acc
    energy = QI(SC)
    avE_i = QI(SD)

    # ---- j-side visc energy: -sum_j WE sum_ab c_ab,j v_a,ij r_b ----
    avE_j = 0.0
    for a, b in AB:
        avE_j = avE_j - (
            vic[a] * bic[b] * col(SE, 16 + C6[(a, b)])
            - vic[a] * col(SE, 22 + 3 * a + b)
            - bic[b] * col(SE, 31 + 3 * a + b)
            + col(SE, 40 + 3 * a + b))

    a_visc_energy = jnp.maximum(avE_i + avE_j, 0.0)
    maxvsignal = jnp.maximum(
        jnp.max(vsig_max, axis=1, keepdims=True), 0.0)
    du = K3d * (prhoi * energy + 0.5 * a_visc_energy)
    outs = [-K3d * mom_x, -K3d * mom_y, -K3d * mom_z, du, maxvsignal]
    return jnp.concatenate([jnp.transpose(o) for o in outs], axis=0)


# --------------------------------------------------------------------------
# stage drivers: assemble J matrices and invoke the kernels
# --------------------------------------------------------------------------

def _pad_rows(rows, mult: int = 8):
    rows = list(rows)
    while len(rows) % mult:
        rows.append(jnp.zeros_like(rows[0]))
    return jnp.stack(rows)


class PallasVE:
    """Compiled pallas pair-stage collection for one (grid, cfg).

    kernel_mode "cell" (default) iterates the Pallas grid per cell —
    flat compile time; "column" unrolls a per-(x,y)-column z-walk over
    9 large contiguous DMAs — fewer/bigger transfers but compile time
    scaling with n (pick it for small grids)."""

    def __init__(self, grid: CMGrid, cfg: SphConfig, interpret: bool = False,
                 kernel_mode: str = "cell", gated: bool = False,
                 zgroup: int = 0):
        # cap 64 packs two cells per 128-lane tile (supercell blocks stay
        # 128-aligned); windows slice at 64-lane static offsets
        assert grid.cap % 32 == 0, "CAP must be a multiple of 32 lanes"
        n_w = int(cfg.sinc_index)
        assert float(n_w) == float(cfg.sinc_index) and n_w >= 2, \
            "pallas path needs an integer sinc index"
        self.grid = grid
        self.cfg = cfg
        self.gated = gated
        self.K3d = kernel_3d_k(cfg.sinc_index)
        kw = dict(K3d=self.K3d, n_w=n_w)
        maker = (make_column_pair_call if kernel_mode == "column"
                 else make_cell_pair_call)
        zkw = {"zgroup": zgroup} if kernel_mode == "cell" else {}
        mk = functools.partial(maker, grid, interpret=interpret, **zkw)
        if gated:
            assert kernel_mode == "cell"
            mk = functools.partial(maker, grid, interpret=interpret,
                                   gated=True, **zkw)
        self._xh = mk(8, 4, functools.partial(_xh_body, cfg=cfg, **kw))
        self._gradh = mk(8, 2, functools.partial(_gradh_body, **kw))
        iad_body = _iad_hybrid_body if cfg.mxu_moments else _iad_direct_body
        self._iad = mk(16, 16, functools.partial(iad_body, **kw))
        av_body = _av_mm_body if cfg.mxu_moments else _av_direct_body
        self._av = mk(16, 8, functools.partial(av_body, cfg=cfg, **kw),
                      fi2=8)
        mom_body = (_momentum_mm_body
                    if cfg.mxu_momentum and not cfg.av_clean
                    else _momentum_body)
        self._mom = mk(32 if cfg.av_clean else 24, 5,
                       functools.partial(mom_body, cfg=cfg, **kw))

    def base_rows(self, layout: CMLayout, x, y, z, h):
        """The 5 base rows shared by all stages (cm frame inputs).
        Invalid slots get FILL_POS positions and gid -1 — distance
        masking replaces an explicit validity row."""
        xcm, ycm, zcm = positions_cm(layout, x, y, z)
        fillv = jnp.where(layout.valid, 0.0, FILL_POS)
        xcm = xcm + fillv
        ycm = ycm + fillv
        zcm = zcm + fillv
        hcm = to_cm(layout, h, fill=1.0)
        gid = jnp.where(layout.valid, layout.src.astype(jnp.float32), -1.0)
        return [xcm, ycm, zcm, hcm, gid]

    def _gate_kw(self, gate, fo):
        if not self.gated:
            assert gate is None
            return {}
        act, prevs = gate
        return dict(act=_pad_rows([act]),
                    prev=jnp.stack(list(prevs)[:fo])
                    if len(prevs) == fo else _pad_rows(list(prevs), fo))

    def xmass_h(self, base, m_cm, gate=None):
        """Fused nc/h-iteration/xmass. Returns (xm, h, nc, nonconv);
        base[3] (h) is NOT updated in place — refresh ghosts of the
        returned h and write it back into the base rows. nonconv is 1.0
        where the h controller did not converge within cfg.h_iter."""
        out = self._xh(_pad_rows(base + [m_cm]), **self._gate_kw(gate, 4))
        return out[0], out[1], out[2], out[3]

    def gradh(self, base, m_cm, xm_cm, gate=None):
        out = self._gradh(_pad_rows(base + [m_cm, xm_cm]),
                          **self._gate_kw(gate, 2))
        return out[0], out[1]

    def iad_divv(self, base, kx_cm, xm_cm, vx_cm, vy_cm, vz_cm, gate=None):
        J = _pad_rows(base + [kx_cm, xm_cm, vx_cm, vy_cm, vz_cm], 16)
        out = self._iad(J, **self._gate_kw(gate, 16))
        cij = tuple(out[i] for i in range(6))
        divv, curlv = out[6], out[7]
        gradv = tuple(out[8 + i] for i in range(6))
        return cij, divv, curlv, gradv

    def av_switches(self, base, c_cm, kx_cm, xm_cm, divv_cm, vx_cm, vy_cm,
                    vz_cm, cij, alpha_cm, dt, gate=None):
        J = _pad_rows(base + [c_cm, kx_cm, xm_cm, divv_cm, vx_cm, vy_cm,
                              vz_cm], 16)
        dt_row = jnp.full_like(alpha_cm, dt)
        I2 = _pad_rows(list(cij) + [alpha_cm, dt_row])
        return self._av(J, I2, **self._gate_kw(gate, 8))[0]

    def momentum(self, base, vx_cm, vy_cm, vz_cm, c_cm, prho_cm, rho_cm,
                 xm_cm, alpha_cm, m_cm, cij, gradv=None, eta_crit_cm=None,
                 gate=None):
        rows = base + [vx_cm, vy_cm, vz_cm, c_cm, prho_cm, rho_cm,
                       xm_cm, alpha_cm, m_cm] + list(cij)
        if self.cfg.av_clean:
            assert gradv is not None and eta_crit_cm is not None
            rows = rows + list(gradv) + [eta_crit_cm]
            J = _pad_rows(rows, 32)
        else:
            J = _pad_rows(rows, 24)
        out = self._mom(J, **self._gate_kw(gate, 5))
        return out[0], out[1], out[2], out[3], out[4]
