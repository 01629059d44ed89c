"""Pallas TPU kernels for the VE pair stages over the cell-major layout.

Physics identical to sphexa_tpu/sph/hydro_ve.py (reference:
sph/include/sph/hydro_ve/*_kern.hpp); execution model completely
different: one Pallas program per interior cell. The 27 neighbor-cell
blocks [F, CAP] stream through the Pallas pipeline (BlockSpec index maps
into the field-major slot matrix) and are consumed as nine [CAP, 3*CAP]
z-run tiles on the VPU — dense masked arithmetic, no gathers, no tree
walk, no PBC folds (ghost cells carry pre-shifted periodic images).
Self-interaction is excluded by particle-gid compare.

This is the TPU analog of the reference's persistent-warp GPU kernels
(xmass_gpu.cu etc.), with the divergent tree traversal replaced by the
regular 27-block stream. CAP must be a multiple of 128 (lane tiling).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sphexa_tpu.config import SphConfig
from sphexa_tpu.ops.cellmajor import CMGrid, CMLayout, positions_cm, to_cm
from sphexa_tpu.sph.kernels import kernel_3d_k

# base row indices in every stage's J matrix
RX, RY, RZ, RH, RVALID, RGID = 0, 1, 2, 3, 4, 5
NBASE = 6

_NEG = -1e30


def _offsets(grid: CMGrid):
    npd = grid.np_
    return [((dx * npd) + dy) * npd + dz
            for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def _center_pid(grid: CMGrid, c):
    n = grid.n
    npd = grid.np_
    cz = jax.lax.rem(c, n)
    cy = jax.lax.rem(jax.lax.div(c, n), n)
    cx = jax.lax.div(c, n * n)
    return ((cx + 1) * npd + (cy + 1)) * npd + (cz + 1)


def make_cell_pair_call(grid: CMGrid, fj: int, fo: int, body: Callable,
                        fi2: int = 0, interpret: bool = False):
    """Build a pallas_call running `body(center, get_run[, i2]) -> [fo, CAP]`
    over all interior cells. get_run(g) returns the g-th z-run tile
    [fj, 3*CAP] (g in 0..8); center is the cell's own [fj, CAP] block."""
    CAP = grid.cap
    offs = _offsets(grid)

    jspecs = [
        pl.BlockSpec((fj, CAP),
                     functools.partial(
                         lambda c, off: (0, _center_pid(grid, c) + off),
                         off=off),
                     memory_space=pltpu.VMEM)
        for off in offs
    ]
    in_specs = list(jspecs)
    if fi2:
        in_specs.append(pl.BlockSpec(
            (fi2, CAP), lambda c: (0, _center_pid(grid, c)),
            memory_space=pltpu.VMEM))
    out_specs = pl.BlockSpec((fo, CAP), lambda c: (0, _center_pid(grid, c)),
                             memory_space=pltpu.VMEM)

    def kernel(*refs):
        jrefs = refs[:27]
        oref = refs[-1]

        def get_run(g):
            return jnp.concatenate(
                [jrefs[3 * g][...], jrefs[3 * g + 1][...],
                 jrefs[3 * g + 2][...]], axis=1)

        center = jrefs[13][...]
        if fi2:
            oref[...] = body(center, get_run, refs[27][...])
        else:
            oref[...] = body(center, get_run)

    def call(J, I2=None):
        n_cells = grid.n ** 3
        args = [J] * 27 + ([I2] if fi2 else [])
        return pl.pallas_call(
            kernel,
            grid=(n_cells,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((fo, grid.n_slots), jnp.float32),
            interpret=interpret,
        )(*args)

    return call


def _icol(center, row):
    """i-side values as a [CAP, 1] column."""
    return jnp.transpose(center[row:row + 1, :])


def _geom(center, jrun):
    """Per-run prelude: displacements, distance, kernel argument, mask."""
    xi, yi, zi = (_icol(center, r) for r in (RX, RY, RZ))
    rx = xi - jrun[RX:RX + 1, :]
    ry = yi - jrun[RY:RY + 1, :]
    rz = zi - jrun[RZ:RZ + 1, :]
    d2 = rx * rx + ry * ry + rz * rz
    dist = jnp.sqrt(d2)
    hi = _icol(center, RH)
    v1 = dist * (1.0 / hi)  # column reciprocal, not a per-pair divide
    mask = (jrun[RVALID:RVALID + 1, :] > 0.5) & \
        (jrun[RGID:RGID + 1, :] != _icol(center, RGID)) & (v1 < 2.0)
    return rx, ry, rz, dist, hi, v1, mask


# Degree-6 polynomials in v^2 for sinc(pi v/2) and (d sinc/dv)/v on
# [0, 2]: max error ~2e-9 (below fp32 resolution), ~7 madds instead of a
# transcendental + divide + branch per evaluation. Fitted offline with a
# series-stabilized derivative target.
_SINC_COEF = (0.9999999994767121, -0.4112335029385433, 0.05073384282987128,
              -0.002980403757215835, 0.00010206937256680724,
              -2.263662159341907e-06, 3.090834479517968e-08)
_DSINC_OVER_V_COEF = (-0.8224670332327884, 0.2029356039981833,
                      -0.017882974714120713, 0.0008171065849809642,
                      -2.2900667062091163e-05, 4.308552351132641e-07,
                      -5.184117393639658e-09)


def _poly_even(v2, coef):
    acc = coef[-1]
    for c in reversed(coef[:-1]):
        acc = acc * v2 + c
    return acc


def _w_sinc_tile(v, sinc_index: float):
    sinc = _poly_even(v * v, _SINC_COEF)
    w = sinc
    for _ in range(int(sinc_index) - 1):
        w = w * sinc
    return jnp.where(v < 2.0, w, 0.0)


def _wd_sinc_tile(v, sinc_index: float):
    v2 = v * v
    sinc = _poly_even(v2, _SINC_COEF)
    dsinc = v * _poly_even(v2, _DSINC_OVER_V_COEF)
    wnm1 = sinc
    for _ in range(int(sinc_index) - 2):
        wnm1 = wnm1 * sinc
    return jnp.where(v < 2.0, sinc_index * wnm1 * dsinc, 0.0)


def _msum(val, mask):
    return jnp.sum(jnp.where(mask, val, 0.0), axis=1, keepdims=True)


# --------------------------------------------------------------------------
# stage bodies (each loops over the nine z-run tiles, accumulating)
# --------------------------------------------------------------------------

def _nc_body(center, get_run):
    nc = 0.0
    for g in range(9):
        *_, mask = _geom(center, get_run(g))
        nc = nc + jnp.sum(mask.astype(jnp.float32), axis=1, keepdims=True)
    return jnp.transpose(nc)


def _xmass_body(center, get_run, *, K3d, sinc_index):
    RM = NBASE
    acc = 0.0
    for g in range(9):
        jr = get_run(g)
        _, _, _, _, hi, v1, mask = _geom(center, jr)
        w = _w_sinc_tile(v1, sinc_index)
        acc = acc + _msum(w * jr[RM:RM + 1, :], mask)
    mi = _icol(center, RM)
    hi = _icol(center, RH)
    xm = mi * (hi * hi * hi) / (K3d * (mi + acc))
    return jnp.transpose(xm)


def _gradh_body(center, get_run, *, K3d, sinc_index):
    RM, RXM = NBASE, NBASE + 1
    kx_a = 0.0
    whomega_a = 0.0
    wrho0_a = 0.0
    for g in range(9):
        jr = get_run(g)
        _, _, _, _, hi, v1, mask = _geom(center, jr)
        w = _w_sinc_tile(v1, sinc_index)
        dw = _wd_sinc_tile(v1, sinc_index)
        dterh = -(3.0 * w + v1 * dw)
        kx_a = kx_a + _msum(w * jr[RXM:RXM + 1, :], mask)
        whomega_a = whomega_a + _msum(dterh * jr[RXM:RXM + 1, :], mask)
        wrho0_a = wrho0_a + _msum(dterh * jr[RM:RM + 1, :], mask)

    mi = _icol(center, RM)
    xmi = _icol(center, RXM)
    hi = _icol(center, RH)
    kx = xmi + kx_a
    whomega = -3.0 * xmi + whomega_a
    wrho0 = -3.0 * mi + wrho0_a

    hinv = 1.0 / hi
    h3inv = hinv * hinv * hinv
    kx = kx * K3d * h3inv
    whomega = whomega * K3d * h3inv * hinv
    wrho0 = wrho0 * K3d * h3inv * hinv

    whomega = whomega * mi / xmi + (kx - K3d * xmi * h3inv) * wrho0
    rho = kx * mi / xmi
    gradh = 1.0 + hi / (rho * 3.0) * whomega
    return jnp.concatenate([jnp.transpose(kx), jnp.transpose(gradh)], axis=0)


def _iad_divv_body(center, get_run, *, K3d, sinc_index):
    RKX, RXM, RVX, RVY, RVZ = NBASE, NBASE + 1, NBASE + 2, NBASE + 3, NBASE + 4
    hi = _icol(center, RH)
    hinv = 1.0 / hi
    h3inv = hinv * hinv * hinv

    # pass 1: IAD tau matrix in h-scaled coordinates (fp32-stable)
    t11 = t12 = t13 = t22 = t23 = t33 = 0.0
    for g in range(9):
        jr = get_run(g)
        rx, ry, rz, dist, _, v1, mask = _geom(center, jr)
        w = _w_sinc_tile(v1, sinc_index)
        volj = jr[RXM:RXM + 1, :] / jr[RKX:RKX + 1, :]
        wn = jnp.where(mask, volj * w, 0.0) * (K3d * h3inv)
        sx = rx * hinv
        sy = ry * hinv
        sz = rz * hinv
        t11 = t11 + jnp.sum(sx * sx * wn, axis=1, keepdims=True)
        t12 = t12 + jnp.sum(sx * sy * wn, axis=1, keepdims=True)
        t13 = t13 + jnp.sum(sx * sz * wn, axis=1, keepdims=True)
        t22 = t22 + jnp.sum(sy * sy * wn, axis=1, keepdims=True)
        t23 = t23 + jnp.sum(sy * sz * wn, axis=1, keepdims=True)
        t33 = t33 + jnp.sum(sz * sz * wn, axis=1, keepdims=True)

    det = (t11 * t22 * t33 + 2.0 * t12 * t23 * t13
           - t11 * t23 * t23 - t22 * t13 * t13 - t33 * t12 * t12)
    fac = 1.0 / (det * hi * hi)
    c11 = (t22 * t33 - t23 * t23) * fac
    c12 = (t13 * t23 - t33 * t12) * fac
    c13 = (t12 * t23 - t22 * t13) * fac
    c22 = (t11 * t33 - t13 * t13) * fac
    c23 = (t13 * t12 - t11 * t23) * fac
    c33 = (t11 * t22 - t12 * t12) * fac

    # pass 2: velocity gradients with the i-side cij
    dVx1 = dVx2 = dVx3 = dVy1 = dVy2 = dVy3 = dVz1 = dVz2 = dVz3 = 0.0
    vxi = _icol(center, RVX)
    vyi = _icol(center, RVY)
    vzi = _icol(center, RVZ)
    for g in range(9):
        jr = get_run(g)
        rx, ry, rz, dist, _, v1, mask = _geom(center, jr)
        w = _w_sinc_tile(v1, sinc_index)
        termA1 = -(c11 * rx + c12 * ry + c13 * rz) * w
        termA2 = -(c12 * rx + c22 * ry + c23 * rz) * w
        termA3 = -(c13 * rx + c23 * ry + c33 * rz) * w
        vx_ji = jr[RVX:RVX + 1, :] - vxi
        vy_ji = jr[RVY:RVY + 1, :] - vyi
        vz_ji = jr[RVZ:RVZ + 1, :] - vzi
        xmj = jr[RXM:RXM + 1, :]
        dVx1 = dVx1 + _msum(vx_ji * xmj * termA1, mask)
        dVx2 = dVx2 + _msum(vx_ji * xmj * termA2, mask)
        dVx3 = dVx3 + _msum(vx_ji * xmj * termA3, mask)
        dVy1 = dVy1 + _msum(vy_ji * xmj * termA1, mask)
        dVy2 = dVy2 + _msum(vy_ji * xmj * termA2, mask)
        dVy3 = dVy3 + _msum(vy_ji * xmj * termA3, mask)
        dVz1 = dVz1 + _msum(vz_ji * xmj * termA1, mask)
        dVz2 = dVz2 + _msum(vz_ji * xmj * termA2, mask)
        dVz3 = dVz3 + _msum(vz_ji * xmj * termA3, mask)

    kxi = _icol(center, RKX)
    norm_kx = K3d * h3inv / kxi
    divv = norm_kx * (dVx1 + dVy2 + dVz3)
    curlv = norm_kx * jnp.sqrt((dVz2 - dVy3) ** 2 + (dVx3 - dVz1) ** 2
                               + (dVy1 - dVx2) ** 2)
    dV11 = norm_kx * dVx1
    dV12 = norm_kx * (dVx2 + dVy1)
    dV13 = norm_kx * (dVx3 + dVz1)
    dV22 = norm_kx * dVy2
    dV23 = norm_kx * (dVy3 + dVz2)
    dV33 = norm_kx * dVz3

    outs = [c11, c12, c13, c22, c23, c33, divv, curlv,
            dV11, dV12, dV13, dV22, dV23, dV33,
            jnp.zeros_like(divv), jnp.zeros_like(divv)]
    return jnp.concatenate([jnp.transpose(o) for o in outs], axis=0)


def _iad_divv_body_mm(center, get_run, *, K3d, sinc_index):
    """Moment-matmul formulation of IAD + divv/curlv: the pair reductions
    are factored into j-side moments so a single [CAP, 3*CAP] x
    [3*CAP, 32] MXU contraction per z-run replaces both VPU reduction
    passes. Coordinates are centered on the i-cell so the raw-moment
    expansion stays fp32-accurate (spread ~ a few h, not box-scale).

    tau_ab = xi_a xi_b S0 - xi_a S_b - xi_b S_a + S_ab
    dV
      dVc_a = -sum_b C_ab [ xi_b (U0_c - vc_i S0') - (U_b_c - vc_i S'_b) ]
    with S* over weight w, columns {volj, volj xj}, {xmj, xmj xj},
    {xmj vcj, xmj vcj xj}.
    """
    RKX, RXM, RVX, RVY, RVZ = NBASE, NBASE + 1, NBASE + 2, NBASE + 3, NBASE + 4
    hi = _icol(center, RH)
    hinv = 1.0 / hi
    h3inv = hinv * hinv * hinv

    # center coordinates on this cell's mean valid position (any common
    # origin with O(cell) spread works; invalid slots are excluded so
    # their fill values cannot drag the origin away)
    vrow = center[RVALID:RVALID + 1, :]
    nv = jnp.maximum(jnp.sum(vrow, axis=1, keepdims=True), 1.0)
    ox = jnp.sum(center[RX:RX + 1, :] * vrow, axis=1, keepdims=True) / nv
    oy = jnp.sum(center[RY:RY + 1, :] * vrow, axis=1, keepdims=True) / nv
    oz = jnp.sum(center[RZ:RZ + 1, :] * vrow, axis=1, keepdims=True) / nv
    xi = _icol(center, RX) - jnp.transpose(ox)
    yi = _icol(center, RY) - jnp.transpose(oy)
    zi = _icol(center, RZ) - jnp.transpose(oz)
    vxi = _icol(center, RVX)
    vyi = _icol(center, RVY)
    vzi = _icol(center, RVZ)
    gid_i = _icol(center, RGID)

    # moment column layout (24 columns, padded to 32 lanes):
    #  0: volj          1-3: volj*xj
    #  4: xmj           5-7: xmj*xj
    #  8: xmj*vxj      9-11: xmj*vxj*xj
    # 12: xmj*vyj     13-15: xmj*vyj*xj
    # 16: xmj*vzj     17-19: xmj*vzj*xj
    # 20-23: volj * {xx, ... } -> not needed; tau uses second moments:
    # 20: volj*xj*xj  (xx) 21: xy 22: xz 23: yy 24: yz 25: zz
    NMOM = 32
    mom = 0.0
    for g in range(9):
        jr = get_run(g)
        xj = jr[RX:RX + 1, :] - ox
        yj = jr[RY:RY + 1, :] - oy
        zj = jr[RZ:RZ + 1, :] - oz
        rx = xi - xj
        ry = yi - yj
        rz = zi - zj
        dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        v1 = dist * hinv
        mask = (jr[RVALID:RVALID + 1, :] > 0.5) & \
            (jr[RGID:RGID + 1, :] != gid_i) & (v1 < 2.0)
        w = jnp.where(mask, _w_sinc_tile(v1, sinc_index), 0.0)  # [CAP, 3CAP]

        volj = jr[RXM:RXM + 1, :] / jr[RKX:RKX + 1, :]
        volj = jnp.where(jr[RVALID:RVALID + 1, :] > 0.5, volj, 0.0)
        xmj = jr[RXM:RXM + 1, :]
        ux = xmj * jr[RVX:RVX + 1, :]
        uy = xmj * jr[RVY:RVY + 1, :]
        uz = xmj * jr[RVZ:RVZ + 1, :]
        one = jnp.ones_like(xj)
        cols = [volj, volj * xj, volj * yj, volj * zj,
                xmj, xmj * xj, xmj * yj, xmj * zj,
                ux, ux * xj, ux * yj, ux * zj,
                uy, uy * xj, uy * yj, uy * zj,
                uz, uz * xj, uz * yj, uz * zj,
                volj * xj * xj, volj * xj * yj, volj * xj * zj,
                volj * yj * yj, volj * yj * zj, volj * zj * zj]
        while len(cols) < NMOM:
            cols.append(jnp.zeros_like(one))
        M = jnp.concatenate(cols, axis=0)  # [NMOM, 3CAP]
        # MXU contraction over the j axis
        mom = mom + jax.lax.dot_general(
            w, M, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [CAP, NMOM]

    def mc(k):
        return mom[:, k:k + 1]  # [CAP, 1]

    # ---- tau (h-scaled at the end) and cij ----
    S0 = mc(0)
    Sx, Sy, Sz = mc(1), mc(2), mc(3)
    knorm = K3d * h3inv
    hi2inv = hinv * hinv

    def tau(a_i, b_i, Sa, Sb, Sab):
        return (a_i * b_i * S0 - a_i * Sb - b_i * Sa + Sab) \
            * knorm * hi2inv

    t11 = tau(xi, xi, Sx, Sx, mc(20))
    t12 = tau(xi, yi, Sx, Sy, mc(21))
    t13 = tau(xi, zi, Sx, Sz, mc(22))
    t22 = tau(yi, yi, Sy, Sy, mc(23))
    t23 = tau(yi, zi, Sy, Sz, mc(24))
    t33 = tau(zi, zi, Sz, Sz, mc(25))

    det = (t11 * t22 * t33 + 2.0 * t12 * t23 * t13
           - t11 * t23 * t23 - t22 * t13 * t13 - t33 * t12 * t12)
    fac = 1.0 / (det * hi * hi)
    c11 = (t22 * t33 - t23 * t23) * fac
    c12 = (t13 * t23 - t33 * t12) * fac
    c13 = (t12 * t23 - t22 * t13) * fac
    c22 = (t11 * t33 - t13 * t13) * fac
    c23 = (t13 * t12 - t11 * t23) * fac
    c33 = (t11 * t22 - t12 * t12) * fac

    # ---- velocity gradients from the same moments ----
    S0m = mc(4)
    Sm = (mc(5), mc(6), mc(7))
    xiv = (xi, yi, zi)

    def dv_terms(U0, U, v_i):
        # E_b = xi_b * (U0 - v_i*S0m) - (U_b - v_i*Sm_b)
        return [xiv[b] * (U0 - v_i * S0m) - (U[b] - v_i * Sm[b])
                for b in range(3)]

    Ex = dv_terms(mc(8), (mc(9), mc(10), mc(11)), vxi)
    Ey = dv_terms(mc(12), (mc(13), mc(14), mc(15)), vyi)
    Ez = dv_terms(mc(16), (mc(17), mc(18), mc(19)), vzi)

    def contract(E):
        # dV_a = sum_j v_ji xmj termA_a = -(C F)_a with F_b = E_b
        return (-(c11 * E[0] + c12 * E[1] + c13 * E[2]),
                -(c12 * E[0] + c22 * E[1] + c23 * E[2]),
                -(c13 * E[0] + c23 * E[1] + c33 * E[2]))

    dVx = contract(Ex)
    dVy = contract(Ey)
    dVz = contract(Ez)

    kxi = _icol(center, RKX)
    norm_kx = knorm / kxi
    divv = norm_kx * (dVx[0] + dVy[1] + dVz[2])
    curlv = norm_kx * jnp.sqrt((dVz[1] - dVy[2]) ** 2 + (dVx[2] - dVz[0]) ** 2
                               + (dVy[0] - dVx[1]) ** 2)
    dV11 = norm_kx * dVx[0]
    dV12 = norm_kx * (dVx[1] + dVy[0])
    dV13 = norm_kx * (dVx[2] + dVz[0])
    dV22 = norm_kx * dVy[1]
    dV23 = norm_kx * (dVy[2] + dVz[1])
    dV33 = norm_kx * dVz[2]

    outs = [c11, c12, c13, c22, c23, c33, divv, curlv,
            dV11, dV12, dV13, dV22, dV23, dV33,
            jnp.zeros_like(divv), jnp.zeros_like(divv)]
    return jnp.concatenate([jnp.transpose(o) for o in outs], axis=0)


def _av_body(center, get_run, i2, *, K3d, sinc_index, cfg: SphConfig):
    RC, RKX, RXM, RDIVV = NBASE, NBASE + 1, NBASE + 2, NBASE + 3
    RVX, RVY, RVZ = NBASE + 4, NBASE + 5, NBASE + 6

    ci = _icol(center, RC)
    divv_i = _icol(center, RDIVV)
    alpha_i = jnp.transpose(i2[6:7, :])
    dt = jnp.transpose(i2[7:8, :])
    hi = _icol(center, RH)
    h3inv = 1.0 / (hi * hi * hi)
    c11i = jnp.transpose(i2[0:1, :])
    c12i = jnp.transpose(i2[1:2, :])
    c13i = jnp.transpose(i2[2:3, :])
    c22i = jnp.transpose(i2[3:4, :])
    c23i = jnp.transpose(i2[4:5, :])
    c33i = jnp.transpose(i2[5:6, :])
    vxi = _icol(center, RVX)
    vyi = _icol(center, RVY)
    vzi = _icol(center, RVZ)

    vsig_max = _NEG
    gx = gy = gz = 0.0
    for g in range(9):
        jr = get_run(g)
        rx, ry, rz, dist, _, v1, mask = _geom(center, jr)
        vx_ij = vxi - jr[RVX:RVX + 1, :]
        vy_ij = vyi - jr[RVY:RVY + 1, :]
        vz_ij = vzi - jr[RVZ:RVZ + 1, :]
        rv = rx * vx_ij + ry * vy_ij + rz * vz_ij
        safe_dist = jnp.where(mask & (dist > 0), dist, 1.0)
        vsig = jnp.where(mask & (rv < 0.0),
                         ci + jr[RC:RC + 1, :] - 3.0 * rv / safe_dist, _NEG)
        vsig_max = jnp.maximum(vsig_max,
                               jnp.max(vsig, axis=1, keepdims=True))

        w = _w_sinc_tile(v1, sinc_index) * (K3d * h3inv)
        termA1 = -(c11i * rx + c12i * ry + c13i * rz) * w
        termA2 = -(c12i * rx + c22i * ry + c23i * rz) * w
        termA3 = -(c13i * rx + c23i * ry + c33i * rz) * w
        volj = jr[RXM:RXM + 1, :] / jr[RKX:RKX + 1, :]
        factor = jnp.where(mask, volj * (divv_i - jr[RDIVV:RDIVV + 1, :]), 0.0)
        gx = gx + jnp.sum(factor * termA1, axis=1, keepdims=True)
        gy = gy + jnp.sum(factor * termA2, axis=1, keepdims=True)
        gz = gz + jnp.sum(factor * termA3, axis=1, keepdims=True)

    vijsignal = jnp.maximum(vsig_max, 1e-30 * ci)
    graddivv = jnp.sqrt(gx * gx + gy * gy + gz * gz)

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


def _momentum_body(center, get_run, *, K3d, sinc_index, cfg: SphConfig):
    (RVX, RVY, RVZ, RC, RPRHO, RKX, RXM, RAL, RM,
     R11, R12, R13, R22, R23, R33) = range(NBASE, NBASE + 15)

    hi = _icol(center, RH)
    hi3inv = 1.0 / (hi * hi * hi)
    c11i = _icol(center, R11)
    c12i = _icol(center, R12)
    c13i = _icol(center, R13)
    c22i = _icol(center, R22)
    c23i = _icol(center, R23)
    c33i = _icol(center, R33)
    vxi = _icol(center, RVX)
    vyi = _icol(center, RVY)
    vzi = _icol(center, RVZ)
    ci = _icol(center, RC)
    alpha_i = _icol(center, RAL)
    mi = _icol(center, RM)
    xmi = _icol(center, RXM)
    rhoi = _icol(center, RKX) * mi / xmi
    prhoi = _icol(center, RPRHO)
    lxmi = jnp.log(xmi)

    mom_x = mom_y = mom_z = 0.0
    energy = 0.0
    a_visc_energy = 0.0
    vsig_max = _NEG
    for g in range(9):
        jr = get_run(g)
        rx, ry, rz, dist, _, v1, mask = _geom(center, jr)
        hj_inv = 1.0 / jr[RH:RH + 1, :]           # [1, 3CAP] row reciprocal
        v2 = dist * hj_inv
        Wi = jnp.where(mask, _w_sinc_tile(v1, sinc_index) * hi3inv, 0.0)
        Wj = jnp.where(mask, _w_sinc_tile(v2, sinc_index)
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
        safe_dist = jnp.where(mask & (dist > 0), dist, 1.0)
        wij = rv / safe_dist
        cj = jr[RC:RC + 1, :]
        vij_signal = (alpha_i + jr[RAL:RAL + 1, :]) / 4.0 * (ci + cj) \
            - 2.0 * wij
        visc = jnp.where(mask & (wij < 0.0), -vij_signal * wij, 0.0)

        vsig_ts = jnp.where(mask, 0.5 * (ci + cj) - 2.0 * wij, _NEG)
        vsig_max = jnp.maximum(vsig_max,
                               jnp.max(vsig_ts, axis=1, keepdims=True))

        mj = jr[RM:RM + 1, :]
        xmj = jr[RXM:RXM + 1, :]
        rhoj = jr[RKX:RKX + 1, :] * mj / xmj
        atwood = jnp.abs(rhoi - rhoj) / (rhoi + rhoj)
        sigma = cfg.ramp * (atwood - cfg.atmin)
        # xmi^(2-s) xmj^s = xmi*xmj * (xmj/xmi)^(s-1): one log+exp pair
        # instead of two of each (the ramp only fires near interfaces)
        # t = (xmj/xmi)^(sigma-1): a = prod*t = xmi^(2-s) xmj^s,
        #                          b = prod/t = xmj^(2-s) xmi^s
        t = jnp.exp((sigma - 1.0) * jnp.log(xmj / xmi))
        prod = xmi * xmj
        a_ramp = prod * t
        b_ramp = prod / t
        a_mom = jnp.where(atwood < cfg.atmin, xmi * xmi,
                          jnp.where(atwood > cfg.atmax, prod, a_ramp))
        b_mom = jnp.where(atwood < cfg.atmin, xmj * xmj,
                          jnp.where(atwood > cfg.atmax, prod, b_ramp))

        a_visc = (mj * (1.0 / rhoi)) * visc       # col reciprocal
        b_visc = (mj / rhoj) * visc               # row-level divide
        a_visc_x = 0.5 * (a_visc * termA1_i + b_visc * termA1_j)
        a_visc_y = 0.5 * (a_visc * termA2_i + b_visc * termA2_j)
        a_visc_z = 0.5 * (a_visc * termA3_i + b_visc * termA3_j)
        a_visc_energy = a_visc_energy + _msum(
            a_visc_x * vx_ij + a_visc_y * vy_ij + a_visc_z * vz_ij, mask)

        energy = energy + _msum(
            mj * a_mom * (vx_ij * termA1_i + vy_ij * termA2_i
                          + vz_ij * termA3_i), mask)

        mom_i = mj * prhoi * a_mom
        mom_j = mj * jr[RPRHO:RPRHO + 1, :] * b_mom
        mom_x = mom_x + _msum(mom_i * termA1_i + mom_j * termA1_j + a_visc_x,
                              mask)
        mom_y = mom_y + _msum(mom_i * termA2_i + mom_j * termA2_j + a_visc_y,
                              mask)
        mom_z = mom_z + _msum(mom_i * termA3_i + mom_j * termA3_j + a_visc_z,
                              mask)

    a_visc_energy = jnp.maximum(a_visc_energy, 0.0)
    maxvsignal = jnp.maximum(vsig_max, 0.0)
    du = K3d * (prhoi * energy + 0.5 * a_visc_energy)
    outs = [-K3d * mom_x, -K3d * mom_y, -K3d * mom_z, du, maxvsignal,
            jnp.zeros_like(du), jnp.zeros_like(du), jnp.zeros_like(du)]
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
    """Compiled pallas pair-stage collection for one (grid, cfg)."""

    def __init__(self, grid: CMGrid, cfg: SphConfig, interpret: bool = False):
        assert grid.cap % 128 == 0, "CAP must be a multiple of 128 lanes"
        self.grid = grid
        self.cfg = cfg
        self.K3d = kernel_3d_k(cfg.sinc_index)
        kw = dict(K3d=self.K3d, sinc_index=cfg.sinc_index)
        ip = interpret
        self._nc = make_cell_pair_call(grid, 8, 1, _nc_body, interpret=ip)
        self._xmass = make_cell_pair_call(
            grid, 8, 1, functools.partial(_xmass_body, **kw), interpret=ip)
        self._gradh = make_cell_pair_call(
            grid, 8, 2, functools.partial(_gradh_body, **kw), interpret=ip)
        iad_body = _iad_divv_body_mm if cfg.mxu_moments else _iad_divv_body
        self._iad = make_cell_pair_call(
            grid, 16, 16, functools.partial(iad_body, **kw),
            interpret=ip)
        self._av = make_cell_pair_call(
            grid, 16, 1,
            functools.partial(_av_body, cfg=cfg, **kw), fi2=8, interpret=ip)
        self._mom = make_cell_pair_call(
            grid, 24, 8, functools.partial(_momentum_body, cfg=cfg, **kw),
            interpret=ip)

    def base_rows(self, layout: CMLayout, x, y, z, h):
        """The 6 base rows shared by all stages (cm frame inputs)."""
        xcm, ycm, zcm = positions_cm(layout, x, y, z)
        hcm = to_cm(layout, h, fill=1.0)
        valid = layout.valid.astype(jnp.float32)
        gid = layout.src.astype(jnp.float32)
        return [xcm, ycm, zcm, hcm, valid, gid]

    def nc(self, base):
        return self._nc(_pad_rows(base))[0]

    def xmass(self, base, m_cm):
        return self._xmass(_pad_rows(base + [m_cm]))[0]

    def gradh(self, base, m_cm, xm_cm):
        out = self._gradh(_pad_rows(base + [m_cm, xm_cm]))
        return out[0], out[1]

    def iad_divv(self, base, kx_cm, xm_cm, vx_cm, vy_cm, vz_cm):
        J = _pad_rows(base + [kx_cm, xm_cm, vx_cm, vy_cm, vz_cm], 16)
        out = self._iad(J)
        cij = tuple(out[i] for i in range(6))
        divv, curlv = out[6], out[7]
        gradv = tuple(out[8 + i] for i in range(6))
        return cij, divv, curlv, gradv

    def av_switches(self, base, c_cm, kx_cm, xm_cm, divv_cm, vx_cm, vy_cm,
                    vz_cm, cij, alpha_cm, dt):
        J = _pad_rows(base + [c_cm, kx_cm, xm_cm, divv_cm, vx_cm, vy_cm,
                              vz_cm], 16)
        dt_row = jnp.full_like(alpha_cm, dt)
        I2 = _pad_rows(list(cij) + [alpha_cm, dt_row])
        return self._av(J, I2)[0]

    def momentum(self, base, vx_cm, vy_cm, vz_cm, c_cm, prho_cm, kx_cm,
                 xm_cm, alpha_cm, m_cm, cij):
        J = _pad_rows(base + [vx_cm, vy_cm, vz_cm, c_cm, prho_cm, kx_cm,
                              xm_cm, alpha_cm, m_cm] + list(cij), 24)
        out = self._mom(J)
        return out[0], out[1], out[2], out[3], out[4]
