"""Ewald-summed periodic gravity (reference: ryoanji/src/ryoanji/nbody/
ewald.hpp:150-381, ewald.h:15-22).

Decomposition, following the reference (pkdgrav/Gasoline lineage):

  near field   particle-particle interactions with all periodic images
               inside `num_replica_shells` box replicas (shell 1 = the
               27 images) — here a dense chunked direct sum, or the FMM
               near field when coupled through fmm_gravity,
  real space   per-particle corrections from the *root multipole*
               (total mass + raw quadrupole of the box) over image
               shells up to ceil(l_cut): -erf(alpha R)/R gammas inside
               the replica region (subtracting what the near field
               already resolved at long range), erfc(alpha R)/R gammas
               outside, with the reference's small-R series expansion
               to avoid cancellation at R -> 0,
  k space      structure-factor sum over integer wave vectors |h| <=
               h_cut, with cos/sin coefficients built from the root
               multipole.

All sums are dense [chunk, n_images/n_kvec] tiles — Ewald is embarras-
singly TPU-friendly. The neutralizing-background convention (constant
pi M / (alpha^2 L^3) term) matches the reference.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sphexa_tpu.config import INDEX_DTYPE
from sphexa_tpu.gravity.direct import Gravity
from sphexa_tpu.sfc.box import Box


@dataclasses.dataclass(frozen=True)
class EwaldSettings:
    """Defaults follow the reference (ewald.h:15-22)."""
    num_replica_shells: int = 1
    l_cut: float = 2.6
    h_cut: float = 2.8
    alpha_scale: float = 2.0
    small_r_scale: float = 3.0e-3   # Gasoline; PKDGrav3/ChaNGa use 1.2e-3


def root_multipole(x, y, z, m, alive):
    """Total mass, center of mass, and raw second moments
    Q_ab = sum m (r-c)_a (r-c)_b of the whole box (the reference's
    Mroot, cartesian_qpole.hpp:100-125 modulo its x3/trace packing)."""
    mm = jnp.where(alive, m, 0.0)
    M = jnp.sum(mm)
    Minv = 1.0 / jnp.maximum(M, 1e-30)
    cx = jnp.sum(mm * x) * Minv
    cy = jnp.sum(mm * y) * Minv
    cz = jnp.sum(mm * z) * Minv
    dx, dy, dz = x - cx, y - cy, z - cz
    Q = (jnp.sum(mm * dx * dx), jnp.sum(mm * dx * dy),
         jnp.sum(mm * dx * dz), jnp.sum(mm * dy * dy),
         jnp.sum(mm * dy * dz), jnp.sum(mm * dz * dz))
    return M, (cx, cy, cz), Q


def _eval_multipole(Rx, Ry, Rz, gam, M, Q):
    """Gamma-weighted multipole evaluation
    (reference: ewald.hpp ewaldEvalMultipoleComplete).
    Returns (u, ax, ay, az) contributions."""
    Qxx, Qxy, Qxz, Qyy, Qyz, Qzz = Q
    Qtr = 0.5 * (Qxx + Qyy + Qzz)
    g0, g1, g2, g3 = gam[0], gam[1], gam[2], gam[3]
    Qrx = Rx * Qxx + Ry * Qxy + Rz * Qxz
    Qry = Rx * Qxy + Ry * Qyy + Rz * Qyz
    Qrz = Rx * Qxz + Ry * Qyz + Rz * Qzz
    rQr = 0.5 * (Rx * Qrx + Ry * Qry + Rz * Qrz)
    u = -g0 * M + g1 * Qtr - g2 * rQr
    coef = g1 * M - g2 * Qtr + g3 * rQr
    return (u, g2 * Qrx - Rx * coef, g2 * Qry - Ry * coef,
            g2 * Qrz - Rz * coef)


def _kspace_tables(M, Q, L, s: EwaldSettings):
    """Integer wave vectors and their multipole structure factors
    (reference: ewald.hpp:169-212)."""
    h_reps = int(np.ceil(s.h_cut))
    rng = np.arange(-h_reps, h_reps + 1)
    hx, hy, hz = np.meshgrid(rng, rng, rng, indexing="ij")
    h = np.stack([hx.ravel(), hy.ravel(), hz.ravel()], 1).astype(np.float64)
    h2 = (h ** 2).sum(1)
    keep = (h2 > 0) & (h2 <= s.h_cut ** 2)
    h = jnp.asarray(h[keep].astype(np.float32))
    h2 = jnp.asarray(h2[keep].astype(np.float32))

    alpha = s.alpha_scale / L
    k4 = np.pi ** 2 / (alpha * alpha * L * L)
    g0 = jnp.exp(-k4 * h2) / (np.pi * h2 * L)
    g1 = (2.0 * np.pi / L) * g0
    g2 = -(2.0 * np.pi / L) * g1
    g3 = (2.0 * np.pi / L) * g2
    g4 = -(2.0 * np.pi / L) * g3
    g5 = (2.0 * np.pi / L) * g4
    zero = jnp.zeros_like(g0)
    del g4, g5  # reference carries them but the potential slot reads 0..2
    hfac_cos, *_ = _eval_multipole(h[:, 0], h[:, 1], h[:, 2],
                                   (g0, zero, g2, zero), M, Q)
    hfac_sin, *_ = _eval_multipole(h[:, 0], h[:, 1], h[:, 2],
                                   (zero, g1, zero, g3), M, Q)
    return h, hfac_cos, hfac_sin


def _image_shells(s: EwaldSettings):
    n_shells = max(int(np.ceil(s.l_cut)), s.num_replica_shells)
    rng = np.arange(-n_shells, n_shells + 1)
    ix, iy, iz = np.meshgrid(rng, rng, rng, indexing="ij")
    shifts = np.stack([ix.ravel(), iy.ravel(), iz.ravel()], 1)
    nrep = s.num_replica_shells
    in_pre = (np.abs(shifts) <= nrep).all(axis=1)
    return shifts.astype(np.float32), in_pre


def ewald_correction(x, y, z, alive, box: Box, M, center, Q,
                     s: EwaldSettings = EwaldSettings(), chunk: int = 8192):
    """Per-particle Ewald correction (real + k space) from the root
    multipole. Add to the replica-shell near field to get the full
    periodic solution. Returns (pot, ax, ay, az) WITHOUT the G factor."""
    assert all(box.periodic), "Ewald needs a fully periodic box"
    L = float(box.lx)
    assert abs(box.ly - L) < 1e-6 * L and abs(box.lz - L) < 1e-6 * L, \
        "Ewald assumes a cubic box (reference has the same restriction)"

    alpha = s.alpha_scale / L
    alpha2 = alpha * alpha
    k1 = np.pi / (alpha2 * L ** 3)
    ka = 2.0 * alpha / np.sqrt(np.pi)
    l_cut2 = s.l_cut ** 2 * L * L
    small_r2 = s.small_r_scale * L * L

    shifts, in_pre = _image_shells(s)
    shifts_j = jnp.asarray(shifts * L)
    in_pre_j = jnp.asarray(in_pre)
    hvec, hfac_cos, hfac_sin = _kspace_tables(M, Q, L, s)
    h_scaled = (2.0 * np.pi / L) * hvec

    N = x.shape[0]
    C = min(chunk, N)
    n_chunks = -(-N // C)
    cx, cy, cz = center

    def body(c):
        idx = jnp.minimum(c * C + jnp.arange(C, dtype=INDEX_DTYPE), N - 1)
        rx = x[idx] - cx
        ry = y[idx] - cy
        rz = z[idx] - cz

        # ---- real space (ewald.hpp:226-341) ----
        Rx = rx[:, None] + shifts_j[None, :, 0]
        Ry = ry[:, None] + shifts_j[None, :, 1]
        Rz = rz[:, None] + shifts_j[None, :, 2]
        R2 = Rx * Rx + Ry * Ry + Rz * Rz
        include = in_pre_j[None, :] | (R2 <= l_cut2)

        Rmag = jnp.sqrt(jnp.maximum(R2, 1e-30))
        invR = 1.0 / Rmag
        invR2 = invR * invR
        a_e = jnp.exp(-R2 * alpha2) * ka * invR2
        erfv = jax.scipy.special.erf(alpha * Rmag)
        fn = jnp.where(in_pre_j[None, :], -erfv, 1.0 - erfv)
        g0 = fn * invR
        g1 = g0 * invR2 + a_e
        g2 = 3.0 * g1 * invR2 + 2.0 * alpha2 * a_e
        g3 = 5.0 * g2 * invR2 + 4.0 * alpha2 * alpha2 * a_e

        # small-R series of the -erf branch (cancellation at R -> 0)
        R2a2 = R2 * alpha2
        s0 = ka * (R2a2 / 3.0 - 1.0)
        s1 = ka * 2.0 * alpha2 * (R2a2 / 5.0 - 1.0 / 3.0)
        s2 = ka * 4.0 * alpha2 ** 2 * (R2a2 / 7.0 - 1.0 / 5.0)
        s3 = ka * 8.0 * alpha2 ** 3 * (R2a2 / 9.0 - 1.0 / 7.0)
        small = R2 < small_r2
        g0 = jnp.where(small, s0, g0)
        g1 = jnp.where(small, s1, g1)
        g2 = jnp.where(small, s2, g2)
        g3 = jnp.where(small, s3, g3)

        u, ax_, ay_, az_ = _eval_multipole(Rx, Ry, Rz, (g0, g1, g2, g3),
                                           M, Q)
        u = jnp.where(include, u, 0.0)
        ax_ = jnp.where(include, ax_, 0.0)
        ay_ = jnp.where(include, ay_, 0.0)
        az_ = jnp.where(include, az_, 0.0)
        pot = k1 * M + jnp.sum(u, 1)
        ax = jnp.sum(ax_, 1)
        ay = jnp.sum(ay_, 1)
        az = jnp.sum(az_, 1)

        # ---- k space (ewald.hpp:344-367) ----
        hdotx = (rx[:, None] * h_scaled[None, :, 0]
                 + ry[:, None] * h_scaled[None, :, 1]
                 + rz[:, None] * h_scaled[None, :, 2])
        cth = jnp.cos(hdotx)
        sth = jnp.sin(hdotx)
        cs_sum = hfac_cos[None, :] * cth + hfac_sin[None, :] * sth
        cs_diff = hfac_cos[None, :] * sth - hfac_sin[None, :] * cth
        # k-space potential enters with + here: in our pot = -sum m/r
        # convention the smooth periodic part is -g0 M cos(...) and
        # hfac_cos already carries the minus (= -g0 M + ...). Verified
        # against a classic fp64 Ewald sum and the Wigner lattice
        # constant (pot*L = +2.837297 for a unit mass in its images).
        pot = pot + jnp.sum(cs_sum, 1)
        ax = ax + jnp.sum(cs_diff * h_scaled[None, :, 0], 1)
        ay = ay + jnp.sum(cs_diff * h_scaled[None, :, 1], 1)
        az = az + jnp.sum(cs_diff * h_scaled[None, :, 2], 1)
        return pot, ax, ay, az

    pot, ax, ay, az = jax.lax.map(body,
                                  jnp.arange(n_chunks, dtype=INDEX_DTYPE))
    out = [v.reshape(n_chunks * C)[:N] for v in (pot, ax, ay, az)]
    return tuple(jnp.where(alive, v, 0.0) for v in out)


def direct_gravity_replicas(x, y, z, m, alive, box: Box, G: float,
                            eps: float = 0.0, n_shells: int = 1,
                            chunk: int = 2048) -> Gravity:
    """Direct sum against all periodic images within n_shells replica
    shells (the reference's 'normal gravity with replicas' near field).
    Self-interaction is excluded only in the zero-shift image."""
    N = x.shape[0]
    C = min(chunk, N)
    n_chunks = -(-N // C)
    eps2 = eps * eps
    mj = jnp.where(alive, m, 0.0)
    rng = range(-n_shells, n_shells + 1)
    shifts = [(sx * box.lx, sy * box.ly, sz * box.lz)
              for sx in rng for sy in rng for sz in rng]

    def body(c):
        i_idx = jnp.minimum(c * C + jnp.arange(C, dtype=INDEX_DTYPE), N - 1)
        xi, yi, zi = x[i_idx], y[i_idx], z[i_idx]
        not_self = (jnp.arange(N, dtype=INDEX_DTYPE)[None, :]
                    != i_idx[:, None])
        ax = ay = az = pot = 0.0
        for sx, sy, sz in shifts:
            rx = xi[:, None] - (x[None, :] + sx)
            ry = yi[:, None] - (y[None, :] + sy)
            rz = zi[:, None] - (z[None, :] + sz)
            r2 = rx * rx + ry * ry + rz * rz + eps2
            zero_shift = (sx == 0.0 and sy == 0.0 and sz == 0.0)
            ok = not_self if zero_shift else jnp.bool_(True)
            inv_r = jax.lax.rsqrt(jnp.where(r2 > 0, r2, 1.0))
            inv_r = jnp.where((r2 > 0) & ok, inv_r, 0.0)
            inv_r3 = inv_r * inv_r * inv_r
            w = mj[None, :] * inv_r3
            ax = ax - jnp.sum(w * rx, axis=1)
            ay = ay - jnp.sum(w * ry, axis=1)
            az = az - jnp.sum(w * rz, axis=1)
            pot = pot - jnp.sum(mj[None, :] * inv_r, axis=1)
        return ax, ay, az, pot

    ax, ay, az, pot = jax.lax.map(body,
                                  jnp.arange(n_chunks, dtype=INDEX_DTYPE))
    out = [v.reshape(n_chunks * C)[:N] * G for v in (ax, ay, az, pot)]
    return Gravity(*out)


def ewald_gravity(x, y, z, m, alive, box: Box, G: float, eps: float = 0.0,
                  settings: EwaldSettings = EwaldSettings(),
                  chunk: int = 2048) -> Gravity:
    """Full periodic gravity: replica-shell direct near field + root-
    multipole Ewald correction (reference: computeGravityEwald driver)."""
    near = direct_gravity_replicas(x, y, z, m, alive, box, G, eps,
                                   settings.num_replica_shells, chunk)
    M, center, Q = root_multipole(x, y, z, m, alive)
    pot, ax, ay, az = ewald_correction(x, y, z, alive, box, M, center, Q,
                                       settings)
    return Gravity(ax=near.ax + G * ax, ay=near.ay + G * ay,
                   az=near.az + G * az, pot=near.pot + G * pot)
