"""Pallas TPU kernels for the VE pair stages over the cell-major layout.

Physics identical to sphexa_tpu/sph/hydro_ve.py (reference:
sph/include/sph/hydro_ve/*_kern.hpp); execution model completely
different: one Pallas program per interior cell, its 27 neighbor-cell
blocks [F, CAP] delivered by the Pallas pipeline (BlockSpec index maps
into the field-major slot matrix), concatenated in VMEM, and consumed as
a dense masked [CAP, 27*CAP] pair tile on the VPU. Ghost cells carry
pre-shifted periodic images, so there is no PBC fold and no wrap logic
in the kernel. Self-interaction is excluded by particle-gid compare.

This is the TPU analog of the reference's persistent-warp GPU kernels
(xmass_gpu.cu etc.) with the tree walk replaced by the regular 27-block
stream.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sphexa_tpu.config import SphConfig
from sphexa_tpu.ops.cellmajor import CMGrid, CMLayout, positions_cm, refresh_ghosts, to_cm
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
    cz = c % n
    cy = (c // n) % n
    cx = c // (n * n)
    return ((cx + 1) * npd + (cy + 1)) * npd + (cz + 1)


def make_cell_pair_call(grid: CMGrid, fj: int, fo: int, body: Callable,
                        fi2: int = 0, interpret: bool = False):
    """Build a pallas_call running `body(center, jcat[, i2]) -> [fo, CAP]`
    over all interior cells.

    center: [fj, CAP] the cell's own block;  jcat: [fj, 27*CAP] the
    neighborhood; i2 (optional): [fi2, CAP] extra i-side-only fields.
    """
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
        jcat = jnp.concatenate([r[...] for r in jrefs], axis=1)
        center = jrefs[13][...]
        if fi2:
            oref[...] = body(center, jcat, refs[27][...])
        else:
            oref[...] = body(center, jcat)

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


def _geom(center, jcat):
    """Common prelude: displacements, distance, masks."""
    xi, yi, zi = (_icol(center, r) for r in (RX, RY, RZ))
    xj = jcat[RX:RX + 1, :]
    yj = jcat[RY:RY + 1, :]
    zj = jcat[RZ:RZ + 1, :]
    rx = xi - xj
    ry = yi - yj
    rz = zi - zj
    d2 = rx * rx + ry * ry + rz * rz
    dist = jnp.sqrt(d2)
    hi = _icol(center, RH)
    mask = (jcat[RVALID:RVALID + 1, :] > 0.5) & \
        (jcat[RGID:RGID + 1, :] != _icol(center, RGID))
    v1 = dist / hi
    in_range = v1 < 2.0
    return rx, ry, rz, dist, hi, v1, mask & in_range


def _w_sinc6_tile(v, sinc_index: float):
    """sinc(pi v/2)^n on a tile; v may be 0 (masked later)."""
    pv = (jnp.pi / 2.0) * v
    small = pv < 0.25
    safe = jnp.where(small, 1.0, pv)
    sinc_exact = jnp.sin(safe) / safe
    pv2 = pv * pv
    sinc = jnp.where(small, 1.0 - pv2 / 6.0 + pv2 * pv2 / 120.0, sinc_exact)
    n_int = int(sinc_index)
    w = sinc
    for _ in range(n_int - 1):
        w = w * sinc
    return jnp.where(v < 2.0, w, 0.0)


def _wd_sinc6_tile(v, sinc_index: float):
    pv = (jnp.pi / 2.0) * v
    small = pv < 0.25
    safe = jnp.where(small, 1.0, pv)
    sin = jnp.sin(safe)
    cos = jnp.cos(safe)
    sinc_exact = sin / safe
    pv2 = pv * pv
    sinc = jnp.where(small, 1.0 - pv2 / 6.0 + pv2 * pv2 / 120.0, sinc_exact)
    dsinc = jnp.where(small, -pv / 3.0 + pv * pv2 / 30.0,
                      sinc_exact * (cos / sin - 1.0 / safe))
    dsinc = (jnp.pi / 2.0) * dsinc
    n_int = int(sinc_index)
    wnm1 = sinc
    for _ in range(n_int - 2):
        wnm1 = wnm1 * sinc
    return jnp.where(v < 2.0, sinc_index * wnm1 * dsinc, 0.0)


def _msum(val, mask):
    return jnp.sum(jnp.where(mask, val, 0.0), axis=1, keepdims=True)


# --------------------------------------------------------------------------
# stage bodies
# --------------------------------------------------------------------------

def _nc_body(center, jcat):
    _, _, _, _, _, v1, mask = _geom(center, jcat)
    nc = jnp.sum(mask.astype(jnp.float32), axis=1, keepdims=True)
    return jnp.transpose(nc)  # [1, CAP]


def _xmass_body(center, jcat, *, K3d, sinc_index):
    RM = NBASE
    _, _, _, _, hi, v1, mask = _geom(center, jcat)
    w = _w_sinc6_tile(v1, sinc_index)
    mi = _icol(center, RM)
    rho0 = mi + _msum(w * jcat[RM:RM + 1, :], mask)
    xm = mi * (hi * hi * hi) / (K3d * rho0)
    return jnp.transpose(xm)


def _gradh_body(center, jcat, *, K3d, sinc_index):
    RM, RXM = NBASE, NBASE + 1
    _, _, _, _, hi, v1, mask = _geom(center, jcat)
    w = _w_sinc6_tile(v1, sinc_index)
    dw = _wd_sinc6_tile(v1, sinc_index)
    dterh = -(3.0 * w + v1 * dw)

    mi = _icol(center, RM)
    xmi = _icol(center, RXM)
    mj = jcat[RM:RM + 1, :]
    xmj = jcat[RXM:RXM + 1, :]

    kx = xmi + _msum(w * xmj, mask)
    whomega = -3.0 * xmi + _msum(dterh * xmj, mask)
    wrho0 = -3.0 * mi + _msum(dterh * mj, mask)

    hinv = 1.0 / hi
    h3inv = hinv * hinv * hinv
    kx = kx * K3d * h3inv
    whomega = whomega * K3d * h3inv * hinv
    wrho0 = wrho0 * K3d * h3inv * hinv

    whomega = whomega * mi / xmi + (kx - K3d * xmi * h3inv) * wrho0
    rho = kx * mi / xmi
    gradh = 1.0 + hi / (rho * 3.0) * whomega
    return jnp.concatenate([jnp.transpose(kx), jnp.transpose(gradh)], axis=0)


def _iad_divv_body(center, jcat, *, K3d, sinc_index):
    RKX, RXM, RVX, RVY, RVZ = NBASE, NBASE + 1, NBASE + 2, NBASE + 3, NBASE + 4
    rx, ry, rz, dist, hi, v1, mask = _geom(center, jcat)
    w = _w_sinc6_tile(v1, sinc_index)
    volj = jcat[RXM:RXM + 1, :] / jcat[RKX:RKX + 1, :]
    weight = jnp.where(mask, volj * w, 0.0)

    hinv = 1.0 / hi
    h3inv = hinv * hinv * hinv
    sx = rx * hinv
    sy = ry * hinv
    sz = rz * hinv
    wn = weight * (K3d * h3inv)

    t11 = jnp.sum(sx * sx * wn, axis=1, keepdims=True)
    t12 = jnp.sum(sx * sy * wn, axis=1, keepdims=True)
    t13 = jnp.sum(sx * sz * wn, axis=1, keepdims=True)
    t22 = jnp.sum(sy * sy * wn, axis=1, keepdims=True)
    t23 = jnp.sum(sy * sz * wn, axis=1, keepdims=True)
    t33 = jnp.sum(sz * sz * wn, axis=1, keepdims=True)

    det = (t11 * t22 * t33 + 2.0 * t12 * t23 * t13
           - t11 * t23 * t23 - t22 * t13 * t13 - t33 * t12 * t12)
    fac = 1.0 / (det * hi * hi)
    c11 = (t22 * t33 - t23 * t23) * fac
    c12 = (t13 * t23 - t33 * t12) * fac
    c13 = (t12 * t23 - t22 * t13) * fac
    c22 = (t11 * t33 - t13 * t13) * fac
    c23 = (t13 * t12 - t11 * t23) * fac
    c33 = (t11 * t22 - t12 * t12) * fac

    termA1 = -(c11 * rx + c12 * ry + c13 * rz) * w
    termA2 = -(c12 * rx + c22 * ry + c23 * rz) * w
    termA3 = -(c13 * rx + c23 * ry + c33 * rz) * w

    vx_ji = jcat[RVX:RVX + 1, :] - _icol(center, RVX)
    vy_ji = jcat[RVY:RVY + 1, :] - _icol(center, RVY)
    vz_ji = jcat[RVZ:RVZ + 1, :] - _icol(center, RVZ)
    xmj = jcat[RXM:RXM + 1, :]

    dVx = [_msum(vx_ji * xmj * t, mask) for t in (termA1, termA2, termA3)]
    dVy = [_msum(vy_ji * xmj * t, mask) for t in (termA1, termA2, termA3)]
    dVz = [_msum(vz_ji * xmj * t, mask) for t in (termA1, termA2, termA3)]

    kxi = _icol(center, RKX)
    norm_kx = K3d * h3inv / kxi
    divv = norm_kx * (dVx[0] + dVy[1] + dVz[2])
    curlv = norm_kx * jnp.sqrt((dVz[1] - dVy[2]) ** 2
                               + (dVx[2] - dVz[0]) ** 2
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


def _av_body(center, jcat, i2, *, K3d, sinc_index, cfg: SphConfig):
    RC, RKX, RXM, RDIVV = NBASE, NBASE + 1, NBASE + 2, NBASE + 3
    RVX, RVY, RVZ = NBASE + 4, NBASE + 5, NBASE + 6
    rx, ry, rz, dist, hi, v1, mask = _geom(center, jcat)

    ci = _icol(center, RC)
    divv_i = _icol(center, RDIVV)
    alpha_i = jnp.transpose(i2[6:7, :])
    dt = jnp.transpose(i2[7:8, :])  # dt broadcast as an input row (traced)

    vx_ij = _icol(center, RVX) - jcat[RVX:RVX + 1, :]
    vy_ij = _icol(center, RVY) - jcat[RVY:RVY + 1, :]
    vz_ij = _icol(center, RVZ) - jcat[RVZ:RVZ + 1, :]
    rv = rx * vx_ij + ry * vy_ij + rz * vz_ij

    safe_dist = jnp.where(mask & (dist > 0), dist, 1.0)
    vsig = jnp.where(mask & (rv < 0.0),
                     ci + jcat[RC:RC + 1, :] - 3.0 * rv / safe_dist, 0.0)
    vijsignal = jnp.maximum(jnp.max(vsig, axis=1, keepdims=True), 1e-30 * ci)

    h3inv = 1.0 / (hi * hi * hi)
    w = _w_sinc6_tile(v1, sinc_index) * (K3d * h3inv)
    c11i = jnp.transpose(i2[0:1, :])
    c12i = jnp.transpose(i2[1:2, :])
    c13i = jnp.transpose(i2[2:3, :])
    c22i = jnp.transpose(i2[3:4, :])
    c23i = jnp.transpose(i2[4:5, :])
    c33i = jnp.transpose(i2[5:6, :])
    termA1 = -(c11i * rx + c12i * ry + c13i * rz) * w
    termA2 = -(c12i * rx + c22i * ry + c23i * rz) * w
    termA3 = -(c13i * rx + c23i * ry + c33i * rz) * w

    volj = jcat[RXM:RXM + 1, :] / jcat[RKX:RKX + 1, :]
    factor = volj * (divv_i - jcat[RDIVV:RDIVV + 1, :])
    gx = _msum(factor * termA1, mask)
    gy = _msum(factor * termA2, mask)
    gz = _msum(factor * termA3, mask)
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


def _momentum_body(center, jcat, *, K3d, sinc_index, cfg: SphConfig):
    (RVX, RVY, RVZ, RC, RPRHO, RKX, RXM, RAL, RM,
     R11, R12, R13, R22, R23, R33) = range(NBASE, NBASE + 15)
    rx, ry, rz, dist, hi, v1, mask = _geom(center, jcat)

    hj = jcat[RH:RH + 1, :]
    v2 = dist / hj
    Wi = _w_sinc6_tile(v1, sinc_index) / (hi * hi * hi)
    Wj = _w_sinc6_tile(v2, sinc_index) / (hj * hj * hj)
    Wi = jnp.where(mask, Wi, 0.0)
    Wj = jnp.where(mask, Wj, 0.0)

    c11i = _icol(center, R11)
    c12i = _icol(center, R12)
    c13i = _icol(center, R13)
    c22i = _icol(center, R22)
    c23i = _icol(center, R23)
    c33i = _icol(center, R33)
    termA1_i = -(c11i * rx + c12i * ry + c13i * rz) * Wi
    termA2_i = -(c12i * rx + c22i * ry + c23i * rz) * Wi
    termA3_i = -(c13i * rx + c23i * ry + c33i * rz) * Wi
    termA1_j = -(jcat[R11:R11 + 1, :] * rx + jcat[R12:R12 + 1, :] * ry
                 + jcat[R13:R13 + 1, :] * rz) * Wj
    termA2_j = -(jcat[R12:R12 + 1, :] * rx + jcat[R22:R22 + 1, :] * ry
                 + jcat[R23:R23 + 1, :] * rz) * Wj
    termA3_j = -(jcat[R13:R13 + 1, :] * rx + jcat[R23:R23 + 1, :] * ry
                 + jcat[R33:R33 + 1, :] * rz) * Wj

    vx_ij = _icol(center, RVX) - jcat[RVX:RVX + 1, :]
    vy_ij = _icol(center, RVY) - jcat[RVY:RVY + 1, :]
    vz_ij = _icol(center, RVZ) - jcat[RVZ:RVZ + 1, :]
    rv = rx * vx_ij + ry * vy_ij + rz * vz_ij

    safe_dist = jnp.where(mask & (dist > 0), dist, 1.0)
    wij = rv / safe_dist
    ci = _icol(center, RC)
    cj = jcat[RC:RC + 1, :]
    alpha_i = _icol(center, RAL)
    vij_signal = (alpha_i + jcat[RAL:RAL + 1, :]) / 4.0 * (ci + cj) - 2.0 * wij
    visc = jnp.where(mask & (wij < 0.0), -vij_signal * wij, 0.0)

    vsig_ts = jnp.where(mask, 0.5 * (ci + cj) - 2.0 * wij, _NEG)
    maxvsignal = jnp.maximum(jnp.max(vsig_ts, axis=1, keepdims=True), 0.0)

    mi = _icol(center, RM)
    mj = jcat[RM:RM + 1, :]
    xmi = _icol(center, RXM)
    xmj = jcat[RXM:RXM + 1, :]
    rhoi = _icol(center, RKX) * mi / xmi
    rhoj = jcat[RKX:RKX + 1, :] * mj / xmj

    atwood = jnp.abs(rhoi - rhoj) / (rhoi + rhoj)
    sigma = cfg.ramp * (atwood - cfg.atmin)
    lxmi = jnp.log(xmi)
    lxmj = jnp.log(xmj)
    a_ramp = jnp.exp((2.0 - sigma) * lxmi + sigma * lxmj)
    b_ramp = jnp.exp((2.0 - sigma) * lxmj + sigma * lxmi)
    a_mom = jnp.where(atwood < cfg.atmin, xmi * xmi,
                      jnp.where(atwood > cfg.atmax, xmi * xmj, a_ramp))
    b_mom = jnp.where(atwood < cfg.atmin, xmj * xmj,
                      jnp.where(atwood > cfg.atmax, xmi * xmj, b_ramp))

    a_visc = mj / rhoi * visc
    b_visc = mj / rhoj * visc
    a_visc_x = 0.5 * (a_visc * termA1_i + b_visc * termA1_j)
    a_visc_y = 0.5 * (a_visc * termA2_i + b_visc * termA2_j)
    a_visc_z = 0.5 * (a_visc * termA3_i + b_visc * termA3_j)
    a_visc_energy = jnp.maximum(
        _msum(a_visc_x * vx_ij + a_visc_y * vy_ij + a_visc_z * vz_ij, mask),
        0.0)

    energy = _msum(mj * a_mom * (vx_ij * termA1_i + vy_ij * termA2_i
                                 + vz_ij * termA3_i), mask)

    prhoi = _icol(center, RPRHO)
    mom_i = mj * prhoi * a_mom
    mom_j = mj * jcat[RPRHO:RPRHO + 1, :] * b_mom
    mom_x = _msum(mom_i * termA1_i + mom_j * termA1_j + a_visc_x, mask)
    mom_y = _msum(mom_i * termA2_i + mom_j * termA2_j + a_visc_y, mask)
    mom_z = _msum(mom_i * termA3_i + mom_j * termA3_j + a_visc_z, mask)

    du = K3d * (prhoi * energy + 0.5 * a_visc_energy)
    outs = [-K3d * mom_x, -K3d * mom_y, -K3d * mom_z, du, maxvsignal,
            jnp.zeros_like(du), jnp.zeros_like(du), jnp.zeros_like(du)]
    return jnp.concatenate([jnp.transpose(o) for o in outs], axis=0)


# --------------------------------------------------------------------------
# stage drivers: assemble J matrices and invoke the kernels
# --------------------------------------------------------------------------

def _pad_rows(rows: Sequence, mult: int = 8):
    rows = list(rows)
    while len(rows) % mult:
        rows.append(jnp.zeros_like(rows[0]))
    return jnp.stack(rows)


class PallasVE:
    """Compiled pallas pair-stage collection for one (grid, cfg)."""

    def __init__(self, grid: CMGrid, cfg: SphConfig, interpret: bool = False):
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
        self._iad = make_cell_pair_call(
            grid, 16, 16, functools.partial(_iad_divv_body, **kw), interpret=ip)
        self._mom = make_cell_pair_call(
            grid, 24, 8, functools.partial(_momentum_body, cfg=cfg, **kw),
            interpret=ip)
        self._av = None
        self._interpret = ip

    def base_rows(self, layout: CMLayout, x, y, z, h):
        """The 6 base rows shared by all stages (cm frame inputs)."""
        xcm, ycm, zcm = positions_cm(layout, x, y, z)
        hcm = to_cm(layout, h, fill=1.0)
        valid = layout.valid.astype(jnp.float32)
        gid = layout.src.astype(jnp.float32)
        return [xcm, ycm, zcm, hcm, valid, gid]

    def nc(self, base):
        J = _pad_rows(base)
        return self._nc(J)[0]

    def xmass(self, base, m_cm):
        J = _pad_rows(base + [m_cm])
        return self._xmass(J)[0]

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
        if self._av is None:
            body = functools.partial(_av_body, K3d=self.K3d,
                                     sinc_index=self.cfg.sinc_index,
                                     cfg=self.cfg)
            self._av = make_cell_pair_call(self.grid, 16, 1, body, fi2=8,
                                           interpret=self._interpret)
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
