"""TPU-native Fast Multipole gravity (the Ryoanji-equivalent solver).

The reference uses warp-aware Barnes-Hut traversal of an adaptive octree
(reference: ryoanji/src/ryoanji/nbody/traversal.cuh, upsweep_cpu.hpp:71,
cartesian_qpole.hpp:176). Tree traversal is divergent and gather-heavy —
exactly what TPUs hate. This module re-derives the same physics as a
*dense, level-synchronous FMM*:

  P2M   segment-sums of raw moments (m, m x, m x x) over leaf cells
  M2M   2x2x2 reshape-sums up the level hierarchy (raw moments add)
  M2L   the 189-offset interaction lists become *strided 3D
        convolutions*: for each child parity, a 7^3 kernel (masked to
        the parity's V-list offsets) maps source multipoles (10ch) to
        local Taylor coefficients (10ch) — running on the MXU
  L2L   parity-dependent expansion shifts broadcast down the hierarchy
  L2P   per-particle evaluation of the order-2 local expansion
  P2P   direct sum over the 27 leaf-cell neighborhood

Multipoles are cartesian through quadrupole (like the reference's
CartesianQuadrupole default); locals are Taylor through the Hessian.
Current scope: open boundaries (Ewald periodic images are the next
round's work, reference: nbody/ewald.hpp).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sphexa_tpu.config import INDEX_DTYPE
from sphexa_tpu.sfc.box import Box

# moment channel order: [M0, Mx, My, Mz, Sxx, Sxy, Sxz, Syy, Syz, Szz]
# local channel order:  [L0, Lx, Ly, Lz, Hxx, Hxy, Hxz, Hyy, Hyz, Hzz]
_SYM = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]


@dataclasses.dataclass(frozen=True)
class FmmConfig:
    level: int = 4        # leaf cells per dim = 2^level
    leaf_cap: int = 128   # max particles per leaf for the P2P pass


# --------------------------------------------------------------------------
# M2L kernel tensors (numpy, trace-time constants)
# --------------------------------------------------------------------------

def _derivative_tensors(R):
    """D0..D3 derivative tensors of 1/|R| (fp64 numpy)."""
    r2 = np.dot(R, R)
    r = np.sqrt(r2)
    D0 = 1.0 / r
    D1 = -R / r ** 3
    D2 = (3.0 * np.outer(R, R) - r2 * np.eye(3)) / r ** 5
    D3 = np.zeros((3, 3, 3))
    for a in range(3):
        for b in range(3):
            for c in range(3):
                D3[a, b, c] = (-15.0 * R[a] * R[b] * R[c] / r ** 7
                               + 3.0 * ((a == b) * R[c] + (a == c) * R[b]
                                        + (b == c) * R[a]) / r ** 5)
    return D0, D1, D2, D3


def _m2l_matrix(R):
    """10x10 matrix: centered source moments -> local Taylor coefficients
    of Phi = -G sum m / |x - y| (G applied later) at separation R."""
    D0, D1, D2, D3 = _derivative_tensors(R)
    K = np.zeros((10, 10))

    # L0 = -(M0 D0 + M1 . D1 + 1/2 M2 : D2)
    K[0, 0] = -D0
    for a in range(3):
        K[0, 1 + a] = -D1[a]
    for ch, (a, b) in enumerate(_SYM):
        K[0, 4 + ch] = -(0.5 if a == b else 1.0) * D2[a, b]

    # L1_a = -(M0 D1_a + M1_b D2_ab + 1/2 M2_bc D3_abc)
    for a in range(3):
        K[1 + a, 0] = -D1[a]
        for b in range(3):
            K[1 + a, 1 + b] = -D2[a, b]
        for ch, (b, c) in enumerate(_SYM):
            K[1 + a, 4 + ch] = -(0.5 if b == c else 1.0) * D3[a, b, c]

    # H_ab = -(M0 D2_ab + M1_c D3_abc)   (M2 x D4 truncated)
    for ch, (a, b) in enumerate(_SYM):
        K[4 + ch, 0] = -D2[a, b]
        for c in range(3):
            K[4 + ch, 1 + c] = -D3[a, b, c]
    return K


def _parity_offsets_exact(p):
    """V-list offsets for child parity p = (px,py,pz): cells d with
    max|d| >= 2 whose parents are adjacent — the standard FMM well-
    separateness criterion. Parent offset for a coordinate of parity pp
    is floor((pp + d)/2)."""
    offs = []
    for dx in range(-3, 4):
        for dy in range(-3, 4):
            for dz in range(-3, 4):
                if max(abs(dx), abs(dy), abs(dz)) < 2:
                    continue
                ok = True
                for d, pp in ((dx, p[0]), (dy, p[1]), (dz, p[2])):
                    po = (pp + d) // 2 - pp // 2  # python floor division
                    if po < -1 or po > 1:
                        ok = False
                        break
                if ok:
                    offs.append((dx, dy, dz))
    return offs


def _m2l_conv_kernels(cell_size: float):
    """For each parity: a [10, 10, 7, 7, 7] conv kernel (fp32) whose
    (i, o, dz, dy, dx) taps are the M2L matrices at the V-list offsets."""
    kernels = {}
    for px in (0, 1):
        for py in (0, 1):
            for pz in (0, 1):
                K = np.zeros((10, 10, 7, 7, 7), np.float32)
                for (dx, dy, dz) in _parity_offsets_exact((px, py, pz)):
                    # R = target_center - source_center = -d * cell_size
                    R = -np.array([dx, dy, dz], np.float64) * cell_size
                    M = _m2l_matrix(R)
                    # kernel[o, i, taps] with spatial taps ordered (x, y, z)
                    K[:, :, dx + 3, dy + 3, dz + 3] = M.astype(np.float32)
                kernels[(px, py, pz)] = K
    return kernels


# --------------------------------------------------------------------------
# solver
# --------------------------------------------------------------------------

class FmmGravity(NamedTuple):
    ax: jnp.ndarray
    ay: jnp.ndarray
    az: jnp.ndarray
    pot: jnp.ndarray


def _leaf_binning(fc: FmmConfig, box: Box, x, y, z, alive):
    n = 1 << fc.level
    gx = jnp.clip(((x - box.xmin) / box.lx * n).astype(jnp.int32), 0, n - 1)
    gy = jnp.clip(((y - box.ymin) / box.ly * n).astype(jnp.int32), 0, n - 1)
    gz = jnp.clip(((z - box.zmin) / box.lz * n).astype(jnp.int32), 0, n - 1)
    cid = (gx * n + gy) * n + gz
    if alive is not None:
        cid = jnp.where(alive, cid, n ** 3)
    return cid


def fmm_gravity(x, y, z, m, alive, box: Box, G: float,
                fc: FmmConfig = FmmConfig(), eps: float = 0.0) -> FmmGravity:
    """Compute accelerations + potential. Box must be cubic (open BCs)."""
    n = 1 << fc.level
    n_leaf = n ** 3
    N = x.shape[0]
    cs_leaf = box.lx / n
    mm = jnp.where(alive, m, 0.0) if alive is not None else m

    cid = _leaf_binning(fc, box, x, y, z, alive)

    # ---- P2M: raw moments per leaf (segment sums) ----
    def seg(v):
        return jax.ops.segment_sum(v, cid, num_segments=n_leaf + 1)[:n_leaf]

    mom = jnp.stack([
        seg(mm), seg(mm * x), seg(mm * y), seg(mm * z),
        seg(mm * x * x), seg(mm * x * y), seg(mm * x * z),
        seg(mm * y * y), seg(mm * y * z), seg(mm * z * z)], axis=0)
    mom = mom.reshape(10, n, n, n)

    # raw -> centered moments about each cell's center (vectorized)
    def centers(level):
        s = 1 << level
        g = [box.xmin + (np.arange(s) + 0.5) * box.lx / s,
             box.ymin + (np.arange(s) + 0.5) * box.ly / s,
             box.zmin + (np.arange(s) + 0.5) * box.lz / s]
        cx, cy, cz = np.meshgrid(g[0], g[1], g[2], indexing="ij")
        return (jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
                jnp.asarray(cz, jnp.float32))

    def center_moments(raw, level):
        cx, cy, cz = centers(level)
        M0 = raw[0]
        Mx = raw[1] - M0 * cx
        My = raw[2] - M0 * cy
        Mz = raw[3] - M0 * cz
        Sxx = raw[4] - 2 * cx * raw[1] + M0 * cx * cx
        Sxy = raw[5] - cx * raw[2] - cy * raw[1] + M0 * cx * cy
        Sxz = raw[6] - cx * raw[3] - cz * raw[1] + M0 * cx * cz
        Syy = raw[7] - 2 * cy * raw[2] + M0 * cy * cy
        Syz = raw[8] - cy * raw[3] - cz * raw[2] + M0 * cy * cz
        Szz = raw[9] - 2 * cz * raw[3] + M0 * cz * cz
        return jnp.stack([M0, Mx, My, Mz, Sxx, Sxy, Sxz, Syy, Syz, Szz])

    # ---- M2M: raw moments add under 2x2x2 aggregation ----
    raw_levels = {fc.level: mom}
    for lvl in range(fc.level - 1, 1, -1):
        s = 1 << (lvl + 1)
        prev = raw_levels[lvl + 1].reshape(10, s // 2, 2, s // 2, 2, s // 2, 2)
        raw_levels[lvl] = prev.sum(axis=(2, 4, 6))

    # ---- M2L as parity-strided convolutions + L2L downsweep ----
    local = None  # [10, s, s, s] at current level
    for lvl in range(2, fc.level + 1):
        s = 1 << lvl
        cs = box.lx / s
        cm = center_moments(raw_levels[lvl], lvl)
        kernels = _m2l_conv_kernels(cs)

        contrib = jnp.zeros((10, s, s, s), jnp.float32)
        src = cm[None]  # NCHW-style: [1, 10, s, s, s]
        for (px, py, pz), K in kernels.items():
            out = jax.lax.conv_general_dilated(
                src, jnp.asarray(K),
                window_strides=(2, 2, 2),
                padding=[(3 - px, 2 + px), (3 - py, 2 + py),
                         (3 - pz, 2 + pz)],
                dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
            # out spatial dims: s/2 per dim -> scatter to parity sublattice
            contrib = contrib.at[:, px::2, py::2, pz::2].add(out[0])
        local = contrib if local is None else local + contrib

        # ---- L2L to the next finer level ----
        if lvl < fc.level:
            child_cs = cs / 2.0
            up = jnp.repeat(jnp.repeat(jnp.repeat(local, 2, 1), 2, 2), 2, 3)
            # shift each child's expansion by b = child_center - parent_center
            bvals = np.array([-0.5, 0.5]) * child_cs
            sp = 1 << (lvl + 1)
            bx = jnp.asarray(np.where(np.arange(sp) % 2 == 0, bvals[0], bvals[1]),
                             jnp.float32)[:, None, None]
            by = jnp.asarray(np.where(np.arange(sp) % 2 == 0, bvals[0], bvals[1]),
                             jnp.float32)[None, :, None]
            bz = jnp.asarray(np.where(np.arange(sp) % 2 == 0, bvals[0], bvals[1]),
                             jnp.float32)[None, None, :]
            L0, Lx, Ly, Lz = up[0], up[1], up[2], up[3]
            Hxx, Hxy, Hxz, Hyy, Hyz, Hzz = up[4], up[5], up[6], up[7], up[8], up[9]
            L0n = (L0 + Lx * bx + Ly * by + Lz * bz
                   + 0.5 * (Hxx * bx * bx + Hyy * by * by + Hzz * bz * bz)
                   + Hxy * bx * by + Hxz * bx * bz + Hyz * by * bz)
            Lxn = Lx + Hxx * bx + Hxy * by + Hxz * bz
            Lyn = Ly + Hxy * bx + Hyy * by + Hyz * bz
            Lzn = Lz + Hxz * bx + Hyz * by + Hzz * bz
            local = jnp.stack([L0n, Lxn, Lyn, Lzn, Hxx, Hxy, Hxz, Hyy,
                               Hyz, Hzz])

    # ---- L2P: evaluate the leaf local expansion at particle positions ----
    lflat = local.reshape(10, n_leaf)
    cxl, cyl, czl = centers(fc.level)
    ccx = cxl.reshape(n_leaf)[jnp.minimum(cid, n_leaf - 1)]
    ccy = cyl.reshape(n_leaf)[jnp.minimum(cid, n_leaf - 1)]
    ccz = czl.reshape(n_leaf)[jnp.minimum(cid, n_leaf - 1)]
    Lp = lflat[:, jnp.minimum(cid, n_leaf - 1)]  # [10, N]
    rx = x - ccx
    ry = y - ccy
    rz = z - ccz
    pot_far = (Lp[0] + Lp[1] * rx + Lp[2] * ry + Lp[3] * rz
               + 0.5 * (Lp[4] * rx * rx + Lp[7] * ry * ry + Lp[9] * rz * rz)
               + Lp[5] * rx * ry + Lp[6] * rx * rz + Lp[8] * ry * rz)
    ax_far = -(Lp[1] + Lp[4] * rx + Lp[5] * ry + Lp[6] * rz)
    ay_far = -(Lp[2] + Lp[5] * rx + Lp[7] * ry + Lp[8] * rz)
    az_far = -(Lp[3] + Lp[6] * rx + Lp[8] * ry + Lp[9] * rz)

    # ---- P2P: direct sum over the 27 leaf-cell neighborhood ----
    ax_nf, ay_nf, az_nf, pot_nf = _p2p(x, y, z, mm, cid, n, fc.leaf_cap, eps)

    return FmmGravity(G * (ax_far + ax_nf), G * (ay_far + ay_nf),
                      G * (az_far + az_nf), G * (pot_far + pot_nf))


def _p2p(x, y, z, m, cid, n: int, cap: int, eps: float, chunk: int = 4096):
    """Near-field direct sum: for each particle, all particles in the 27
    surrounding leaf cells (open boundaries: out-of-range cells empty)."""
    N = x.shape[0]
    n_leaf = n ** 3
    order = jnp.argsort(cid).astype(INDEX_DTYPE)
    cid_sorted = cid[order]
    cell_start = jnp.searchsorted(
        cid_sorted, jnp.arange(n_leaf + 1, dtype=cid_sorted.dtype)
    ).astype(INDEX_DTYPE)
    xs, ys, zs, ms = x[order], y[order], z[order], m[order]
    cs = cid_sorted

    C = min(chunk, N)
    n_chunks = -(-N // C)
    Npad = n_chunks * C
    M = 27 * cap
    eps2 = eps * eps

    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]

    def body(c):
        i_idx = jnp.minimum(c * C + jnp.arange(C, dtype=INDEX_DTYPE), N - 1)
        ci = cs[i_idx].astype(jnp.int32)
        gz = ci % n
        gy = (ci // n) % n
        gx = ci // (n * n)

        starts = []
        counts = []
        for (dx, dy, dz) in offs:
            jx, jy, jz = gx + dx, gy + dy, gz + dz
            ok = ((jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
                  & (jz >= 0) & (jz < n))
            ncid = jnp.where(ok, (jx * n + jy) * n + jz, n_leaf)
            st = cell_start[ncid]
            cnt = jnp.where(ok, jnp.minimum(cell_start[ncid + 1] - st, cap), 0)
            starts.append(st)
            counts.append(cnt)
        starts = jnp.stack(starts, 1)
        counts = jnp.stack(counts, 1)

        lane = jnp.arange(cap, dtype=INDEX_DTYPE)
        cand = starts[:, :, None] + lane[None, None, :]
        valid = lane[None, None, :] < counts[:, :, None]
        cand = jnp.where(valid, cand, 0).reshape(C, M)
        valid = valid.reshape(C, M) & (cand != i_idx[:, None])

        rx = xs[i_idx][:, None] - xs[cand]
        ry = ys[i_idx][:, None] - ys[cand]
        rz = zs[i_idx][:, None] - zs[cand]
        r2 = rx * rx + ry * ry + rz * rz + eps2
        inv_r = jax.lax.rsqrt(jnp.where(r2 > 0, r2, 1.0))
        inv_r = jnp.where(valid & (r2 > 0), inv_r, 0.0)
        inv_r3 = inv_r ** 3
        w = ms[cand] * inv_r3
        return (-jnp.sum(w * rx, 1), -jnp.sum(w * ry, 1),
                -jnp.sum(w * rz, 1), -jnp.sum(ms[cand] * inv_r, 1))

    ax, ay, az, pot = jax.lax.map(body, jnp.arange(n_chunks, dtype=INDEX_DTYPE))
    # results are per sorted-frame i; scatter back to original order
    inv = jnp.zeros((N,), INDEX_DTYPE).at[order].set(
        jnp.arange(N, dtype=INDEX_DTYPE))
    out = []
    for v in (ax, ay, az, pot):
        out.append(v.reshape(Npad)[:N][inv])
    return tuple(out)
