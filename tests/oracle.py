"""Independent float64 numpy reference implementations used as test
oracles — the same strategy the reference uses with its O(N^2) all-pairs
cross-checks (reference: domain/test/unit/neighbors/all_to_all.hpp,
ryoanji/test/nbody/direct.cu).

Everything here is deliberately simple, loop-free numpy in fp64; the
production JAX fp32 path must agree within fp32 tolerances.
"""

from __future__ import annotations

import numpy as np

from sphexa_tpu.sph.kernels import wharmonic_np, wharmonic_derivative_np


def fold(r, L, periodic):
    if not periodic:
        return r
    return r - L * np.round(r / L)


def displacements(x, y, z, box):
    """[N, N] displacement components r_i - r_j with minimum image."""
    px, py, pz = box.periodic
    rx = fold(x[:, None] - x[None, :], box.lx, px)
    ry = fold(y[:, None] - y[None, :], box.ly, py)
    rz = fold(z[:, None] - z[None, :], box.lz, pz)
    return rx, ry, rz


def all_pairs_neighbors(x, y, z, h, box):
    """Set of neighbors within 2*h_i per particle (excluding self)."""
    rx, ry, rz = displacements(x, y, z, box)
    d2 = rx ** 2 + ry ** 2 + rz ** 2
    within = d2 < (2.0 * h[:, None]) ** 2
    np.fill_diagonal(within, False)
    return within  # [N, N] bool


def w(v, n=6.0):
    out = wharmonic_np(v) ** n
    return np.where(v < 2.0, out, 0.0)


def wd(v, n=6.0):
    out = n * wharmonic_np(v) ** (n - 1.0) * wharmonic_derivative_np(v)
    return np.where(v < 2.0, out, 0.0)


def xmass(x, y, z, h, m, K, box, within=None):
    """VE generalized volume element (reference: xmass_kern.hpp:51-79)."""
    if within is None:
        within = all_pairs_neighbors(x, y, z, h, box)
    rx, ry, rz = displacements(x, y, z, box)
    dist = np.sqrt(rx ** 2 + ry ** 2 + rz ** 2)
    v = dist / h[:, None]
    wv = np.where(within, w(v), 0.0)
    rho0 = m + (wv * m[None, :]).sum(axis=1)  # self + neighbors
    h3inv = 1.0 / h ** 3
    return m / (rho0 * K * h3inv)


def ve_def_gradh(x, y, z, h, m, xm, K, box, within=None):
    """kx and gradh (reference: ve_def_gradh_kern.hpp:44-90)."""
    if within is None:
        within = all_pairs_neighbors(x, y, z, h, box)
    rx, ry, rz = displacements(x, y, z, box)
    dist = np.sqrt(rx ** 2 + ry ** 2 + rz ** 2)
    v = dist / h[:, None]
    wv = np.where(within, w(v), 0.0)
    dwv = np.where(within, wd(v), 0.0)
    dterh = -(3.0 * wv + v * dwv)

    kx = xm + (wv * xm[None, :]).sum(axis=1)
    whomega = -3.0 * xm + (dterh * xm[None, :]).sum(axis=1)
    wrho0 = -3.0 * m + (dterh * m[None, :]).sum(axis=1)

    hinv = 1.0 / h
    h3inv = hinv ** 3
    kx = kx * K * h3inv
    whomega = whomega * K * h3inv * hinv
    wrho0 = wrho0 * K * h3inv * hinv

    whomega = whomega * m / xm + (kx - K * xm * h3inv) * wrho0
    rho = kx * m / xm
    dhdrho = -h / (rho * 3.0)
    gradh = 1.0 - dhdrho * whomega
    return kx, gradh


def ideal_gas_eos(temp, rho, mui, gamma):
    R = 8.317e7
    cv = R / mui / (gamma - 1.0)
    tmp = cv * temp * (gamma - 1.0)
    return rho * tmp, np.sqrt(tmp)  # p, c


def eos_ve(temp, m, kx, xm, gradh, mui, gamma):
    rho = kx * m / xm
    p, c = ideal_gas_eos(temp, rho, mui, gamma)
    prho = p / (kx * m * m * gradh)
    return rho, p, c, prho


def iad(x, y, z, h, K, box, volj, within=None):
    """IAD cij matrix terms; volj = xm/kx for VE, m/rho for std
    (reference: hydro_ve/iad_kern.hpp:44-109)."""
    if within is None:
        within = all_pairs_neighbors(x, y, z, h, box)
    rx, ry, rz = displacements(x, y, z, box)
    dist = np.sqrt(rx ** 2 + ry ** 2 + rz ** 2)
    v = dist / h[:, None]
    wv = np.where(within, w(v), 0.0)
    weight = volj[None, :] * wv

    tau11 = (rx * rx * weight).sum(axis=1)
    tau12 = (rx * ry * weight).sum(axis=1)
    tau13 = (rx * rz * weight).sum(axis=1)
    tau22 = (ry * ry * weight).sum(axis=1)
    tau23 = (ry * rz * weight).sum(axis=1)
    tau33 = (rz * rz * weight).sum(axis=1)

    det = (tau11 * tau22 * tau33 + 2.0 * tau12 * tau23 * tau13
           - tau11 * tau23 ** 2 - tau22 * tau13 ** 2 - tau33 * tau12 ** 2)
    factor = h ** 3 / (det * K)
    c11 = (tau22 * tau33 - tau23 ** 2) * factor
    c12 = (tau13 * tau23 - tau33 * tau12) * factor
    c13 = (tau12 * tau23 - tau22 * tau13) * factor
    c22 = (tau11 * tau33 - tau13 ** 2) * factor
    c23 = (tau13 * tau12 - tau11 * tau23) * factor
    c33 = (tau11 * tau22 - tau12 ** 2) * factor
    return c11, c12, c13, c22, c23, c33


def divv_curlv(x, y, z, vx, vy, vz, h, K, box, kx, xm, cij, within=None):
    """(reference: hydro_ve/divv_curlv_kern.hpp:44-123)"""
    if within is None:
        within = all_pairs_neighbors(x, y, z, h, box)
    c11, c12, c13, c22, c23, c33 = cij
    rx, ry, rz = displacements(x, y, z, box)
    dist = np.sqrt(rx ** 2 + ry ** 2 + rz ** 2)
    v = dist / h[:, None]
    wv = np.where(within, w(v), 0.0)

    termA1 = -(c11[:, None] * rx + c12[:, None] * ry + c13[:, None] * rz) * wv
    termA2 = -(c12[:, None] * rx + c22[:, None] * ry + c23[:, None] * rz) * wv
    termA3 = -(c13[:, None] * rx + c23[:, None] * ry + c33[:, None] * rz) * wv

    vx_ji = vx[None, :] - vx[:, None]
    vy_ji = vy[None, :] - vy[:, None]
    vz_ji = vz[None, :] - vz[:, None]
    xmj = xm[None, :]

    dVx = np.stack([(vx_ji * xmj * t).sum(axis=1) for t in (termA1, termA2, termA3)])
    dVy = np.stack([(vy_ji * xmj * t).sum(axis=1) for t in (termA1, termA2, termA3)])
    dVz = np.stack([(vz_ji * xmj * t).sum(axis=1) for t in (termA1, termA2, termA3)])

    norm_kx = K / (h ** 3 * kx)
    divv = norm_kx * (dVx[0] + dVy[1] + dVz[2])
    curl = np.sqrt((dVz[1] - dVy[2]) ** 2 + (dVx[2] - dVz[0]) ** 2 + (dVy[0] - dVx[1]) ** 2)
    curlv = norm_kx * curl
    dV11 = norm_kx * dVx[0]
    dV12 = norm_kx * (dVx[1] + dVy[0])
    dV13 = norm_kx * (dVx[2] + dVz[0])
    dV22 = norm_kx * dVy[1]
    dV23 = norm_kx * (dVy[2] + dVz[1])
    dV33 = norm_kx * dVz[2]
    return divv, curlv, (dV11, dV12, dV13, dV22, dV23, dV33)


def av_switches(x, y, z, vx, vy, vz, h, c, K, box, kx, xm, divv, cij, alpha,
                dt, alphamin, alphamax, decay_constant, within=None):
    """(reference: hydro_ve/av_switches_kern.hpp:44-137)"""
    if within is None:
        within = all_pairs_neighbors(x, y, z, h, box)
    c11, c12, c13, c22, c23, c33 = cij
    rx, ry, rz = displacements(x, y, z, box)
    dist = np.sqrt(rx ** 2 + ry ** 2 + rz ** 2)
    np.fill_diagonal(dist, 1.0)
    v = dist / h[:, None]
    wv = np.where(within, w(v), 0.0) * K / (h ** 3)[:, None]

    vx_ij = vx[:, None] - vx[None, :]
    vy_ij = vy[:, None] - vy[None, :]
    vz_ij = vz[:, None] - vz[None, :]
    rv = rx * vx_ij + ry * vy_ij + rz * vz_ij

    vsig = np.where(within & (rv < 0.0), c[:, None] + c[None, :] - 3.0 * rv / dist, 0.0)
    vijsignal = np.maximum(vsig.max(axis=1), 1e-40 * c)

    termA1 = -(c11[:, None] * rx + c12[:, None] * ry + c13[:, None] * rz) * wv
    termA2 = -(c12[:, None] * rx + c22[:, None] * ry + c23[:, None] * rz) * wv
    termA3 = -(c13[:, None] * rx + c23[:, None] * ry + c33[:, None] * rz) * wv

    volj = (xm / kx)[None, :]
    factor = volj * (divv[:, None] - divv[None, :])
    gx = (factor * termA1).sum(axis=1)
    gy = (factor * termA2).sum(axis=1)
    gz = (factor * termA3).sum(axis=1)
    graddivv = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2)

    a_const = h * h * graddivv
    alphaloc = np.where(divv < 0.0,
                        alphamax * a_const / (a_const + h * np.abs(divv) + 0.05 * c),
                        0.0)

    decay = h / (decay_constant * vijsignal)
    alphadot = np.where(alphaloc >= alphamin,
                        (alphaloc - alpha) / decay,
                        (alphamin - alpha) / decay)
    alpha_new = np.where(alphaloc >= alpha, alphaloc, alpha + alphadot * dt)
    return alpha_new


def momentum_energy(x, y, z, vx, vy, vz, h, m, prho, c, cij, K, box,
                    kx, xm, alpha, atmin, atmax, ramp, within=None,
                    gradv=None, nc=None):
    """(reference: hydro_ve/momentum_energy_kern.hpp:65-222; gradv
    enables the avClean rv correction of :44-63)"""
    if within is None:
        within = all_pairs_neighbors(x, y, z, h, box)
    c11, c12, c13, c22, c23, c33 = cij
    rx, ry, rz = displacements(x, y, z, box)
    dist = np.sqrt(rx ** 2 + ry ** 2 + rz ** 2)
    np.fill_diagonal(dist, 1.0)

    hi = h[:, None]
    hj = h[None, :]
    v1 = dist / hi
    v2 = dist / hj
    Wi = w(v1) / hi ** 3
    Wj = w(v2) / hj ** 3
    Wi = np.where(within, Wi, 0.0)
    Wj = np.where(within, Wj, 0.0)

    termA1_i = -(c11[:, None] * rx + c12[:, None] * ry + c13[:, None] * rz) * Wi
    termA2_i = -(c12[:, None] * rx + c22[:, None] * ry + c23[:, None] * rz) * Wi
    termA3_i = -(c13[:, None] * rx + c23[:, None] * ry + c33[:, None] * rz) * Wi
    termA1_j = -(c11[None, :] * rx + c12[None, :] * ry + c13[None, :] * rz) * Wj
    termA2_j = -(c12[None, :] * rx + c22[None, :] * ry + c23[None, :] * rz) * Wj
    termA3_j = -(c13[None, :] * rx + c23[None, :] * ry + c33[None, :] * rz) * Wj

    vx_ij = vx[:, None] - vx[None, :]
    vy_ij = vy[:, None] - vy[None, :]
    vz_ij = vz[:, None] - vz[None, :]
    rv = rx * vx_ij + ry * vy_ij + rz * vz_ij

    if gradv is not None:
        # avClean correction (momentum_energy_kern.hpp:44-63)
        dV11, dV12, dV13, dV22, dV23, dV33 = gradv

        def quad(g11, g12, g13, g22, g23, g33):
            # r . symv(gradV, r) with the symv of kernels.hpp:88-95
            q1 = g11 * rx + g12 * ry + g13 * rz
            q2 = g22 * ry + g23 * rz
            q3 = g33 * rz
            return rx * q1 + ry * q2 + rz * q3

        dmy1 = quad(dV11[:, None], dV12[:, None], dV13[:, None],
                    dV22[:, None], dV23[:, None], dV33[:, None])
        dmy2 = quad(dV11[None, :], dV12[None, :], dV13[None, :],
                    dV22[None, :], dV23[None, :], dV33[None, :])
        eta_ab = np.minimum(v1, v2)
        eta_crit = np.cbrt(32.0 * np.pi / 3.0 / (nc[:, None] + 1.0))
        eta_diff = 5.0 * (eta_ab - eta_crit)
        dmy3 = np.where(eta_ab < eta_crit, np.exp(-eta_diff ** 2), 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            A_ab = np.where(dmy2 != 0.0, dmy1 / np.where(dmy2 != 0, dmy2, 1.0), 0.0)
        A_abp1 = 1.0 + A_ab
        phi_ab = 0.5 * dmy3 * np.clip(4.0 * A_ab / A_abp1 ** 2, 0.0, 1.0)
        rv = rv + (-phi_ab * (dmy1 + dmy2))

    wij = rv / dist

    beta = 2.0
    vij_signal = (alpha[:, None] + alpha[None, :]) / 4.0 * (c[:, None] + c[None, :]) - beta * wij
    visc = np.where(within & (wij < 0.0), -vij_signal * wij, 0.0)

    vsig_ts = np.where(within, 0.5 * (c[:, None] + c[None, :]) - 2.0 * wij, 0.0)
    maxvsignal = vsig_ts.max(axis=1)

    rho = kx * m / xm
    rhoi, rhoj = rho[:, None], rho[None, :]
    xmi, xmj = xm[:, None], xm[None, :]
    atwood = np.abs(rhoi - rhoj) / (rhoi + rhoj)
    sigma = ramp * (atwood - atmin)
    a_mom = np.where(atwood < atmin, xmi ** 2,
                     np.where(atwood > atmax, xmi * xmj,
                              xmi ** (2.0 - sigma) * xmj ** sigma))
    b_mom = np.where(atwood < atmin, xmj ** 2,
                     np.where(atwood > atmax, xmi * xmj,
                              xmj ** (2.0 - sigma) * xmi ** sigma))

    mj = m[None, :]
    a_visc = mj / rhoi * visc
    b_visc = mj / rhoj * visc
    a_visc_x = 0.5 * (a_visc * termA1_i + b_visc * termA1_j)
    a_visc_y = 0.5 * (a_visc * termA2_i + b_visc * termA2_j)
    a_visc_z = 0.5 * (a_visc * termA3_i + b_visc * termA3_j)
    a_visc_energy = np.maximum(
        (a_visc_x * vx_ij + a_visc_y * vy_ij + a_visc_z * vz_ij).sum(axis=1), 0.0)

    energy = (mj * a_mom * (vx_ij * termA1_i + vy_ij * termA2_i + vz_ij * termA3_i)).sum(axis=1)

    mom_i = mj * prho[:, None] * a_mom
    mom_j = mj * prho[None, :] * b_mom
    mom_x = (mom_i * termA1_i + mom_j * termA1_j + a_visc_x).sum(axis=1)
    mom_y = (mom_i * termA2_i + mom_j * termA2_j + a_visc_y).sum(axis=1)
    mom_z = (mom_i * termA3_i + mom_j * termA3_j + a_visc_z).sum(axis=1)

    du = K * (prho * energy + 0.5 * a_visc_energy)
    ax = -K * mom_x
    ay = -K * mom_y
    az = -K * mom_z
    return ax, ay, az, du, maxvsignal
