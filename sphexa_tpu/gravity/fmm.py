"""TPU-native Fast Multipole gravity (the Ryoanji-equivalent solver).

The reference uses warp-aware Barnes-Hut traversal of an adaptive octree
(reference: ryoanji/src/ryoanji/nbody/traversal.cuh, upsweep_cpu.hpp:71,
cartesian_qpole.hpp:176). Tree traversal is divergent and gather-heavy —
exactly what TPUs hate. This module re-derives the same physics as a
*dense, level-synchronous FMM*:

  P2M   segment-sums of raw moments (m, m x, m x x, m x x x) over
        leaf cells, in box-centered coordinates (fp32 headroom)
  M2M   2x2x2 reshape-sums up the level hierarchy (raw moments add)
  M2L   the 189-offset interaction lists become *strided 3D
        convolutions*: for each child parity, a 7^3 kernel (masked to
        the parity's V-list offsets) maps source multipoles (20ch,
        through octupole) to local Taylor coefficients (10ch) —
        running on the MXU
  L2L   parity-dependent expansion shifts broadcast down the hierarchy
  L2P   per-particle evaluation of the order-2 local expansion
  P2P   direct sum over the 27 leaf-cell neighborhood

Multipoles are cartesian through OCTUPOLE (one order beyond the
reference's CartesianQuadrupole default, toward its order-P spherical
kernels, kernel.hpp:489); locals are Taylor through the Hessian, with
the quadrupole-D4 and octupole-D5 Hessian terms retained. Periodic
boxes: see gravity/ewald.py (root-multipole Ewald correction).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sphexa_tpu.config import INDEX_DTYPE
from sphexa_tpu.sfc.box import Box

# moment channels: [M0, Mx, My, Mz, Sxx, Sxy, Sxz, Syy, Syz, Szz,
#                    Txxx, Txxy, Txxz, Txyy, Txyz, Txzz, Tyyy, Tyyz,
#                    Tyyz, Tzzz] (20, raw/central cartesian)
# local channels:   [L0, Lx, Ly, Lz, Hxx, Hxy, Hxz, Hyy, Hyz, Hzz]
_SYM = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
_SYM3 = [(0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 1, 1), (0, 1, 2),
         (0, 2, 2), (1, 1, 1), (1, 1, 2), (1, 2, 2), (2, 2, 2)]
# multinomial multiplicity of each symmetric 3rd-moment slot
_MULT3 = [1, 3, 3, 3, 6, 3, 1, 3, 3, 1]
NCH_M = 20   # source moment channels (through octupole)
NCH_L = 20   # local channels (through 3rd-order Taylor: L0, L1, H, C)


@dataclasses.dataclass(frozen=True)
class FmmConfig:
    level: int = 4        # leaf cells per dim = 2^level
    leaf_cap: int = 128   # max particles per leaf for the P2P pass
    min_sep: int = 3      # well-separateness |d| >= min_sep at EVERY
                          # level (pairs closer than that defer to the
                          # child level, whose per-parity lists extend
                          # to |d| <= 2*min_sep - 1); 3 caps the
                          # worst-pair expansion ratio at 0.58 instead
                          # of the classic V-list's 0.87 — the
                          # fixed-list analog of a tighter MAC theta.
                          # Near field: (2*min_sep - 1)^3 leaf P2P.

    @property
    def wide_near(self) -> bool:   # back-compat alias
        return self.min_sep >= 3


# --------------------------------------------------------------------------
# M2L kernel tensors (numpy, trace-time constants)
# --------------------------------------------------------------------------

def _derivative_tensors(R):
    """D0..D5 derivative tensors of 1/|R| (fp64 numpy). Standard closed
    forms: D_k = (-1)^k (2k-1)!! R^{(k)}/r^{2k+1} + delta-contraction
    terms."""
    r2 = np.dot(R, R)
    r = np.sqrt(r2)
    d = np.eye(3)
    D0 = 1.0 / r
    D1 = -R / r ** 3
    D2 = (3.0 * np.outer(R, R) - r2 * np.eye(3)) / r ** 5
    D3 = np.zeros((3, 3, 3))
    for a in range(3):
        for b in range(3):
            for c in range(3):
                D3[a, b, c] = (-15.0 * R[a] * R[b] * R[c] / r ** 7
                               + 3.0 * (d[a, b] * R[c] + d[a, c] * R[b]
                                        + d[b, c] * R[a]) / r ** 5)
    D4 = np.zeros((3, 3, 3, 3))
    for a in range(3):
        for b in range(3):
            for c in range(3):
                for e in range(3):
                    pair_rr = (d[a, b] * R[c] * R[e] + d[a, c] * R[b] * R[e]
                               + d[a, e] * R[b] * R[c] + d[b, c] * R[a] * R[e]
                               + d[b, e] * R[a] * R[c] + d[c, e] * R[a] * R[b])
                    pair_dd = (d[a, b] * d[c, e] + d[a, c] * d[b, e]
                               + d[a, e] * d[b, c])
                    D4[a, b, c, e] = (105.0 * R[a] * R[b] * R[c] * R[e] / r ** 9
                                      - 15.0 * pair_rr / r ** 7
                                      + 3.0 * pair_dd / r ** 5)
    import itertools
    D5 = np.zeros((3, 3, 3, 3, 3))
    for idx in itertools.product(range(3), repeat=5):
        v = -945.0 * np.prod([R[i] for i in idx]) / r ** 11
        # one delta, three R factors: choose the delta pair (10 ways)
        for (p, q) in itertools.combinations(range(5), 2):
            rest = [idx[k] for k in range(5) if k not in (p, q)]
            v += 105.0 * d[idx[p], idx[q]] * np.prod(
                [R[i] for i in rest]) / r ** 9
        # two deltas, one R factor: 15 pairings
        for (p, q) in itertools.combinations(range(5), 2):
            others = [k for k in range(5) if k not in (p, q)]
            for (u, w) in itertools.combinations(others, 2):
                rest = [k for k in others if k not in (u, w)]
                v += -15.0 * d[idx[p], idx[q]] * d[idx[u], idx[w]] \
                    * R[idx[rest[0]]] / r ** 7
        D5[idx] = v
    return D0, D1, D2, D3, D4, D5


def _m2l_matrix(R):
    """[10, 20] matrix: centered source moments (through octupole) ->
    local Taylor coefficients of Phi = -G sum m / |x - y| (G applied
    later) at separation R. Taylor/multipole weights: 1/2 on second
    moments, 1/6 on third, with multinomial multiplicities for the
    symmetric storage."""
    D0, D1, D2, D3, D4, D5 = _derivative_tensors(R)
    K = np.zeros((NCH_L, NCH_M))

    def w2(a, b):
        return 0.5 if a == b else 1.0   # 1/2 * multiplicity(2)

    # L0 = -(M0 D0 + M1.D1 + 1/2 M2:D2 + 1/6 M3:.D3)
    K[0, 0] = -D0
    for a in range(3):
        K[0, 1 + a] = -D1[a]
    for ch, (a, b) in enumerate(_SYM):
        K[0, 4 + ch] = -w2(a, b) * D2[a, b]
    for ch, (a, b, c) in enumerate(_SYM3):
        K[0, 10 + ch] = -(_MULT3[ch] / 6.0) * D3[a, b, c]

    # L1_a = -(M0 D1_a + M1_b D2_ab + 1/2 M2_bc D3_abc + 1/6 M3 D4)
    for a in range(3):
        K[1 + a, 0] = -D1[a]
        for b in range(3):
            K[1 + a, 1 + b] = -D2[a, b]
        for ch, (b, c) in enumerate(_SYM):
            K[1 + a, 4 + ch] = -w2(b, c) * D3[a, b, c]
        for ch, (b, c, e) in enumerate(_SYM3):
            K[1 + a, 10 + ch] = -(_MULT3[ch] / 6.0) * D4[a, b, c, e]

    # H_ab = -(M0 D2_ab + M1_c D3_abc + 1/2 M2_ce D4_abce + 1/6 M3 D5)
    for ch, (a, b) in enumerate(_SYM):
        K[4 + ch, 0] = -D2[a, b]
        for c in range(3):
            K[4 + ch, 1 + c] = -D3[a, b, c]
        for ch2, (c, e) in enumerate(_SYM):
            K[4 + ch, 4 + ch2] = -w2(c, e) * D4[a, b, c, e]
        for ch3, (c, e, f) in enumerate(_SYM3):
            K[4 + ch, 10 + ch3] = -(_MULT3[ch3] / 6.0) * D5[a, b, c, e, f]

    # C_abc = -(M0 D3_abc + M1_e D4_abce + 1/2 M2_ef D5_abcef)
    # (third-order local coefficients; M3 x D6 is beyond the scheme's
    # O((a/d)^4) truncation)
    for ch, (a, b, c) in enumerate(_SYM3):
        K[10 + ch, 0] = -D3[a, b, c]
        for e in range(3):
            K[10 + ch, 1 + e] = -D4[a, b, c, e]
        for ch2, (e, f) in enumerate(_SYM):
            K[10 + ch, 4 + ch2] = -w2(e, f) * D5[a, b, c, e, f]

    # 1/|R + r - y'| expands in (r - y')^k: source displacements enter
    # with (-1)^j, so ODD source moments flip sign (validated against a
    # two-cluster fp64 oracle: 4e-5 vs 4e-2 relative potential error)
    K[:, 1:4] *= -1.0
    K[:, 10:] *= -1.0
    return K


def _parity_offsets_exact(p, min_sep: int = 2):
    """Interaction-list offsets for child parity p = (px,py,pz): cells
    d with max|d| >= min_sep whose parent pair was NOT well-separated
    (|parent offset| <= min_sep - 1, so the parent level deferred the
    pair down). min_sep=2 is the classic 189-offset V-list; min_sep=3
    widens every level's near region (deferred pairs reach |d| <=
    2*min_sep - 1 at the child), capping the worst-pair expansion
    ratio at sqrt(3)/3 = 0.58. Parent offset for a coordinate of
    parity pp is floor((pp + d)/2)."""
    D = 2 * min_sep - 1
    po_max = min_sep - 1
    offs = []
    for dx in range(-D, D + 1):
        for dy in range(-D, D + 1):
            for dz in range(-D, D + 1):
                if max(abs(dx), abs(dy), abs(dz)) < min_sep:
                    continue
                ok = True
                for d, pp in ((dx, p[0]), (dy, p[1]), (dz, p[2])):
                    po = (pp + d) // 2 - pp // 2  # python floor division
                    if po < -po_max or po > po_max:
                        ok = False
                        break
                if ok:
                    offs.append((dx, dy, dz))
    return offs


def _derivative_tensors_batch(R):
    """Vectorized D0..D5 derivative tensors of 1/|R| over a batch of
    separations R: [K, 3] -> D0 [K], D1 [K,3], ... D5 [K,3,3,3,3,3]
    (fp64 numpy). Same closed forms as `_derivative_tensors`, evaluated
    for every interaction-list offset at once — the scalar version costs
    ~50 ms per offset and dominated fmm trace time (442 s at level 3)."""
    import itertools

    K = R.shape[0]
    r2 = np.einsum("ka,ka->k", R, R)
    r = np.sqrt(r2)
    d = np.eye(3)
    ir = {k: r ** (-k) for k in (1, 3, 5, 7, 9, 11)}
    D0 = ir[1]
    D1 = -R * ir[3][:, None]
    D2 = (3.0 * R[:, :, None] * R[:, None, :]
          - r2[:, None, None] * d[None]) * ir[5][:, None, None]
    D3 = np.zeros((K, 3, 3, 3))
    for a in range(3):
        for b in range(3):
            for c in range(3):
                D3[:, a, b, c] = (
                    -15.0 * R[:, a] * R[:, b] * R[:, c] * ir[7]
                    + 3.0 * (d[a, b] * R[:, c] + d[a, c] * R[:, b]
                             + d[b, c] * R[:, a]) * ir[5])
    D4 = np.zeros((K, 3, 3, 3, 3))
    for a in range(3):
        for b in range(3):
            for c in range(3):
                for e in range(3):
                    pair_rr = (d[a, b] * R[:, c] * R[:, e]
                               + d[a, c] * R[:, b] * R[:, e]
                               + d[a, e] * R[:, b] * R[:, c]
                               + d[b, c] * R[:, a] * R[:, e]
                               + d[b, e] * R[:, a] * R[:, c]
                               + d[c, e] * R[:, a] * R[:, b])
                    pair_dd = (d[a, b] * d[c, e] + d[a, c] * d[b, e]
                               + d[a, e] * d[b, c])
                    D4[:, a, b, c, e] = (
                        105.0 * R[:, a] * R[:, b] * R[:, c] * R[:, e] * ir[9]
                        - 15.0 * pair_rr * ir[7] + 3.0 * pair_dd * ir[5])
    D5 = np.zeros((K, 3, 3, 3, 3, 3))
    for idx in itertools.product(range(3), repeat=5):
        v = -945.0 * R[:, idx[0]] * R[:, idx[1]] * R[:, idx[2]] \
            * R[:, idx[3]] * R[:, idx[4]] * ir[11]
        for (p, q) in itertools.combinations(range(5), 2):
            rest = [idx[k] for k in range(5) if k not in (p, q)]
            v = v + 105.0 * d[idx[p], idx[q]] \
                * R[:, rest[0]] * R[:, rest[1]] * R[:, rest[2]] * ir[9]
        for (p, q) in itertools.combinations(range(5), 2):
            others = [k for k in range(5) if k not in (p, q)]
            for (u, w) in itertools.combinations(others, 2):
                rest = [k for k in others if k not in (u, w)]
                v = v - 15.0 * d[idx[p], idx[q]] * d[idx[u], idx[w]] \
                    * R[:, idx[rest[0]]] * ir[7]
        D5[:, idx[0], idx[1], idx[2], idx[3], idx[4]] = v
    return D0, D1, D2, D3, D4, D5


def _m2l_matrix_batch(R):
    """Vectorized `_m2l_matrix` over R: [K, 3] -> [K, NCH_L, NCH_M]."""
    D0, D1, D2, D3, D4, D5 = _derivative_tensors_batch(R)
    K = np.zeros((R.shape[0], NCH_L, NCH_M))

    def w2(a, b):
        return 0.5 if a == b else 1.0

    K[:, 0, 0] = -D0
    for a in range(3):
        K[:, 0, 1 + a] = -D1[:, a]
    for ch, (a, b) in enumerate(_SYM):
        K[:, 0, 4 + ch] = -w2(a, b) * D2[:, a, b]
    for ch, (a, b, c) in enumerate(_SYM3):
        K[:, 0, 10 + ch] = -(_MULT3[ch] / 6.0) * D3[:, a, b, c]

    for a in range(3):
        K[:, 1 + a, 0] = -D1[:, a]
        for b in range(3):
            K[:, 1 + a, 1 + b] = -D2[:, a, b]
        for ch, (b, c) in enumerate(_SYM):
            K[:, 1 + a, 4 + ch] = -w2(b, c) * D3[:, a, b, c]
        for ch, (b, c, e) in enumerate(_SYM3):
            K[:, 1 + a, 10 + ch] = -(_MULT3[ch] / 6.0) * D4[:, a, b, c, e]

    for ch, (a, b) in enumerate(_SYM):
        K[:, 4 + ch, 0] = -D2[:, a, b]
        for c in range(3):
            K[:, 4 + ch, 1 + c] = -D3[:, a, b, c]
        for ch2, (c, e) in enumerate(_SYM):
            K[:, 4 + ch, 4 + ch2] = -w2(c, e) * D4[:, a, b, c, e]
        for ch3, (c, e, f) in enumerate(_SYM3):
            K[:, 4 + ch, 10 + ch3] = -(_MULT3[ch3] / 6.0) * D5[:, a, b, c, e, f]

    for ch, (a, b, c) in enumerate(_SYM3):
        K[:, 10 + ch, 0] = -D3[:, a, b, c]
        for e in range(3):
            K[:, 10 + ch, 1 + e] = -D4[:, a, b, c, e]
        for ch2, (e, f) in enumerate(_SYM):
            K[:, 10 + ch, 4 + ch2] = -w2(e, f) * D5[:, a, b, c, e, f]

    # odd source moments flip sign (see `_m2l_matrix`)
    K[:, :, 1:4] *= -1.0
    K[:, :, 10:] *= -1.0
    return K


# channel polynomial orders: M0 | M1 (x3) | M2 (x6) | M3 (x10)
_CH_ORDER = np.array([0] + [1] * 3 + [2] * 6 + [3] * 10)


@functools.lru_cache(maxsize=None)
def _unit_kernel_stack(min_sep: int = 2):
    """The full-offset-grid M2L tensor at UNIT cell size plus per-parity
    tap masks, computed once per min_sep (module-level cache). The
    kernel value at offset d is parity-independent; parity only selects
    which taps are present."""
    D = 2 * min_sep - 1
    S = 2 * D + 1
    offs = [(dx, dy, dz)
            for dx in range(-D, D + 1)
            for dy in range(-D, D + 1)
            for dz in range(-D, D + 1)
            if max(abs(dx), abs(dy), abs(dz)) >= min_sep]
    # R = target_center - source_center = -d (unit cell size)
    R = -np.asarray(offs, np.float64)
    Kmat = _m2l_matrix_batch(R)  # [n_offs, NCH_L, NCH_M]
    full = np.zeros((NCH_L, NCH_M, S, S, S))
    for k, (dx, dy, dz) in enumerate(offs):
        full[:, :, dx + D, dy + D, dz + D] = Kmat[k]
    masks = {}
    for px in (0, 1):
        for py in (0, 1):
            for pz in (0, 1):
                m = np.zeros((S, S, S), bool)
                for (dx, dy, dz) in _parity_offsets_exact((px, py, pz),
                                                          min_sep):
                    m[dx + D, dy + D, dz + D] = True
                masks[(px, py, pz)] = m
    return full, masks


def _unit_kernel_device(min_sep: int = 2):
    """(unit_tensor, parity_masks) as shared device arrays from a
    process-level cache: the UNIT-cell-size [NCH_L, NCH_M, S, S, S]
    M2L tensor (S = 4*min_sep - 1, ~2 MB fp32) plus eight f32
    [S, S, S] tap masks. Per-level kernels are derived in-graph
    (K = unit * cs^-(order_j + order_l + 1) * mask — D_k homogeneity),
    so a program tracing the FMM hoists ~2 MB of parameters instead of
    ~17 MB per level: the big hoisted sets broke SECOND executions of
    combined Pallas+FMM programs on the v5e (INVALID_ARGUMENT /
    worker crash; queue4/5 logs 2026-08-19), while the FMM alone and
    the pair kernels alone were fine.

    Uncommitted (plain jnp.asarray, no device_put) so shard_map paths
    can close over them; built under ensure_compile_time_eval because
    this usually runs inside a jit trace, where a bare jnp.asarray
    stages the constant as a tracer — caching that leaks it into every
    later program (UnexpectedTracerError on the second)."""
    key = int(min_sep)
    hit = _M2L_DEVICE_CACHE.get(key)
    if hit is not None:
        return hit
    full, masks = _unit_kernel_stack(min_sep)
    with jax.ensure_compile_time_eval():
        unit = jnp.asarray(full.astype(np.float32))
        pmasks = {p: jnp.asarray(m.astype(np.float32))
                  for p, m in masks.items()}
    _M2L_DEVICE_CACHE[key] = (unit, pmasks)
    return unit, pmasks


_M2L_DEVICE_CACHE: dict = {}


# --------------------------------------------------------------------------
# solver
# --------------------------------------------------------------------------

class FmmGravity(NamedTuple):
    ax: jnp.ndarray
    ay: jnp.ndarray
    az: jnp.ndarray
    pot: jnp.ndarray
    # particle slots beyond leaf_cap in any near-field leaf: the P2P
    # candidate gather clamps per-cell counts, so a nonzero value means
    # silently dropped near-field pairs — surfaced for the same
    # fail-stop treatment as cell-capacity overflow (the reference
    # throws on traversal-stack exhaustion, xmass_gpu.cu:120-128)
    nf_truncated: jnp.ndarray = 0


def _leaf_binning(fc: FmmConfig, box: Box, x, y, z, alive):
    n = 1 << fc.level
    gx = jnp.clip(((x - box.xmin) / box.lx * n).astype(jnp.int32), 0, n - 1)
    gy = jnp.clip(((y - box.ymin) / box.ly * n).astype(jnp.int32), 0, n - 1)
    gz = jnp.clip(((z - box.zmin) / box.lz * n).astype(jnp.int32), 0, n - 1)
    cid = (gx * n + gy) * n + gz
    if alive is not None:
        cid = jnp.where(alive, cid, n ** 3)
    return cid


def _box_centered(box: Box, x, y, z):
    bcx = 0.5 * (box.xmin + box.xmax)
    bcy = 0.5 * (box.ymin + box.ymax)
    bcz = 0.5 * (box.zmin + box.zmax)
    return (x - bcx, y - bcy, z - bcz)


def _raw_leaf_moments(co, mm, cid, n: int):
    """P2M: raw moments per leaf (segment sums), 20 channels, on the
    global 2^level grid. Under sharding each rank contributes only its
    own particles; the stacks ADD across ranks (raw moments are linear
    in the sources), so a psum of this array is the exact global P2M —
    the dense-grid analog of the reference's globalFocusExchange
    (ryoanji/interface/global_multipole.hpp:45)."""
    n_leaf = n ** 3

    def seg(v):
        return jax.ops.segment_sum(v, cid, num_segments=n_leaf + 1)[:n_leaf]

    rows = [seg(mm)]
    rows += [seg(mm * co[a]) for a in range(3)]
    rows += [seg(mm * co[a] * co[b]) for (a, b) in _SYM]
    rows += [seg(mm * co[a] * co[b] * co[c]) for (a, b, c) in _SYM3]
    return jnp.stack(rows, axis=0).reshape(NCH_M, n, n, n)


def fmm_gravity(x, y, z, m, alive, box: Box, G: float,
                fc: FmmConfig = FmmConfig(), eps: float = 0.0) -> FmmGravity:
    """Compute accelerations + potential. Box must be cubic (open BCs)."""
    n = 1 << fc.level
    mm = jnp.where(alive, m, 0.0) if alive is not None else m
    cid = _leaf_binning(fc, box, x, y, z, alive)
    # box-centered coordinates: raw high-order moments grow like
    # (coordinate scale)^3, so halving the scale buys fp32 headroom in
    # the raw -> central cancellation
    co = _box_centered(box, x, y, z)
    mom = _raw_leaf_moments(co, mm, cid, n)
    local = _far_field(mom, box, fc)
    pot_far, ax_far, ay_far, az_far = _l2p(local, co, cid, box, fc)

    # ---- P2P: direct sum over the leaf-cell near field ----
    reach = fc.min_sep - 1
    ax_nf, ay_nf, az_nf, pot_nf, nf_trunc = _p2p(
        x, y, z, mm, cid, n, fc.leaf_cap, eps, reach=reach)

    return FmmGravity(G * (ax_far + ax_nf), G * (ay_far + ay_nf),
                      G * (az_far + az_nf), G * (pot_far + pot_nf),
                      nf_truncated=nf_trunc)


def _centers(box: Box, level: int):
    s = 1 << level
    g = [(np.arange(s) + 0.5) * box.lx / s - box.lx / 2,
         (np.arange(s) + 0.5) * box.ly / s - box.ly / 2,
         (np.arange(s) + 0.5) * box.lz / s - box.lz / 2]
    cx, cy, cz = np.meshgrid(g[0], g[1], g[2], indexing="ij")
    return (jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
            jnp.asarray(cz, jnp.float32))


def _far_field(mom, box: Box, fc: FmmConfig):
    """M2M upsweep + conv-M2L + L2L downsweep on the dense level stack:
    global leaf raw moments [NCH_M, n, n, n] -> leaf-level local
    expansions [NCH_L, n, n, n]."""
    n = 1 << fc.level

    _I2 = {p: 4 + i for i, p in enumerate(_SYM)}

    def _i2(a, b):
        return _I2[tuple(sorted((a, b)))]

    def centers(level):
        return _centers(box, level)

    # raw -> centered moments about each cell's (box-centered) center
    def center_moments(raw, level):
        cc = centers(level)
        M0 = raw[0]
        out = [M0]
        for a in range(3):
            out.append(raw[1 + a] - M0 * cc[a])
        for (a, b) in _SYM:
            out.append(raw[_i2(a, b)] - cc[a] * raw[1 + b]
                       - cc[b] * raw[1 + a] + M0 * cc[a] * cc[b])
        for ch, (a, b, c) in enumerate(_SYM3):
            out.append(raw[10 + ch]
                       - cc[c] * raw[_i2(a, b)] - cc[b] * raw[_i2(a, c)]
                       - cc[a] * raw[_i2(b, c)]
                       + cc[b] * cc[c] * raw[1 + a]
                       + cc[a] * cc[c] * raw[1 + b]
                       + cc[a] * cc[b] * raw[1 + c]
                       - cc[a] * cc[b] * cc[c] * M0)
        return jnp.stack(out)

    # ---- M2M: raw moments add under 2x2x2 aggregation ----
    raw_levels = {fc.level: mom}
    for lvl in range(fc.level - 1, 1, -1):
        s = 1 << (lvl + 1)
        prev = raw_levels[lvl + 1].reshape(NCH_M, s // 2, 2, s // 2, 2,
                                           s // 2, 2)
        raw_levels[lvl] = prev.sum(axis=(2, 4, 6))

    # ---- M2L as parity-strided convolutions + L2L downsweep ----
    local = None  # [10, s, s, s] at current level
    for lvl in range(2, fc.level + 1):
        s = 1 << lvl
        cs = box.lx / s
        cm = center_moments(raw_levels[lvl], lvl)
        # Per-level kernels derived IN-GRAPH from one shared unit-scale
        # tensor: D_k is homogeneous, so K_level = unit * cs^-(j+l+1),
        # and parity only selects taps (a mask multiply). This keeps
        # the program's hoisted constants at ONE ~2 MB tensor instead
        # of eight 2 MB parity kernels per level (~17 MB/level): large
        # hoisted-parameter sets broke second executions of combined
        # Pallas+FMM programs on the v5e (INVALID_ARGUMENT, queue5
        # 2026-08-19), and the shared form is also what the M2L math
        # actually says.
        unit, pmasks = _unit_kernel_device(fc.min_sep)
        lvl_scale = jnp.asarray(
            (float(cs) ** (-(_CH_ORDER[:, None] + _CH_ORDER[None, :] + 1)
                           .astype(np.float64))).astype(np.float32))
        Klvl = unit * lvl_scale[:, :, None, None, None]
        H = 2 * fc.min_sep - 1   # kernel half-width

        contrib = jnp.zeros((NCH_L, s, s, s), jnp.float32)
        src = cm[None]  # NCHW-style: [1, 20, s, s, s]
        for (px, py, pz), pm in pmasks.items():
            K = Klvl * pm[None, None]
            out = jax.lax.conv_general_dilated(
                src, K,
                window_strides=(2, 2, 2),
                padding=[(H - px, H - 1 + px), (H - py, H - 1 + py),
                         (H - pz, H - 1 + pz)],
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
            b3 = (bx, by, bz)

            def csym(a_, b_, c_):
                key = tuple(sorted((a_, b_, c_)))
                return up[10 + _SYM3.index(key)]

            def hsym(a_, b_):
                return up[4 + _SYM.index(tuple(sorted((a_, b_))))]

            # L0 <- L0 + L.b + 1/2 b.H.b + 1/6 C:bbb
            L0n = up[0]
            for a_ in range(3):
                L0n = L0n + up[1 + a_] * b3[a_]
            for a_ in range(3):
                for b_ in range(3):
                    L0n = L0n + 0.5 * hsym(a_, b_) * b3[a_] * b3[b_]
                    for c_ in range(3):
                        L0n = L0n + (1.0 / 6.0) * csym(a_, b_, c_) \
                            * b3[a_] * b3[b_] * b3[c_]
            # L1_a <- L1_a + H_ab b_b + 1/2 C_abc b_b b_c
            L1n = []
            for a_ in range(3):
                v = up[1 + a_]
                for b_ in range(3):
                    v = v + hsym(a_, b_) * b3[b_]
                    for c_ in range(3):
                        v = v + 0.5 * csym(a_, b_, c_) * b3[b_] * b3[c_]
                L1n.append(v)
            # H_ab <- H_ab + C_abc b_c ; C unchanged
            Hn = []
            for (a_, b_) in _SYM:
                v = hsym(a_, b_)
                for c_ in range(3):
                    v = v + csym(a_, b_, c_) * b3[c_]
                Hn.append(v)
            local = jnp.stack([L0n] + L1n + Hn + [up[10 + k]
                                                  for k in range(10)])
    return local


def _l2p(local, co, cid, box: Box, fc: FmmConfig):
    """Evaluate the leaf local expansion at particle positions."""
    n = 1 << fc.level
    n_leaf = n ** 3
    lflat = local.reshape(NCH_L, n_leaf)
    cxl, cyl, czl = _centers(box, fc.level)
    ccx = cxl.reshape(n_leaf)[jnp.minimum(cid, n_leaf - 1)]
    ccy = cyl.reshape(n_leaf)[jnp.minimum(cid, n_leaf - 1)]
    ccz = czl.reshape(n_leaf)[jnp.minimum(cid, n_leaf - 1)]
    Lp = lflat[:, jnp.minimum(cid, n_leaf - 1)]  # [10, N]
    rx = co[0] - ccx
    ry = co[1] - ccy
    rz = co[2] - ccz
    rr = (rx, ry, rz)

    def lC(a_, b_, c_):
        return Lp[10 + _SYM3.index(tuple(sorted((a_, b_, c_))))]

    def lH(a_, b_):
        return Lp[4 + _SYM.index(tuple(sorted((a_, b_))))]

    pot_far = (Lp[0] + Lp[1] * rx + Lp[2] * ry + Lp[3] * rz
               + 0.5 * (Lp[4] * rx * rx + Lp[7] * ry * ry + Lp[9] * rz * rz)
               + Lp[5] * rx * ry + Lp[6] * rx * rz + Lp[8] * ry * rz)
    for ch, (a_, b_, c_) in enumerate(_SYM3):
        pot_far = pot_far + (_MULT3[ch] / 6.0) * Lp[10 + ch] \
            * rr[a_] * rr[b_] * rr[c_]

    acc_far = []
    for a_ in range(3):
        g = Lp[1 + a_]
        for b_ in range(3):
            g = g + lH(a_, b_) * rr[b_]
            for c_ in range(3):
                g = g + 0.5 * lC(a_, b_, c_) * rr[b_] * rr[c_]
        acc_far.append(-g)
    ax_far, ay_far, az_far = acc_far
    return pot_far, ax_far, ay_far, az_far


MOMENT_PSUM_BYTE_CAP = 64 << 20   # hard scale guard (see DESIGN.md):
# the sharded far field psums a dense [NCH_M, 8^level] fp32 stack =
# 20 * 4 * 8^level bytes (level 4: 320 KB, 5: 2.5 MB, 6: 20 MB,
# 7: 160 MB). Level 7+ is a pod-scale dead end for the dense design —
# fail hard instead of silently choking ICI.


def moment_grid_bytes(level: int) -> int:
    """Bytes psum'd per rank by the sharded far field."""
    return NCH_M * (8 ** level) * 4


def _check_psum_budget(fc: FmmConfig):
    b = moment_grid_bytes(fc.level)
    if b > MOMENT_PSUM_BYTE_CAP:
        raise ValueError(
            f"sharded FMM level {fc.level} psums {b / 2**20:.0f} MB of "
            f"dense moments per rank (> {MOMENT_PSUM_BYTE_CAP / 2**20:.0f}"
            " MB cap); the dense moment-grid design stops paying past "
            "level 6 — shard the grid or lower the level (DESIGN.md: "
            "hierarchical-FMM scale ceiling)")


def min_level_for_bands(n_ranks: int, extent_frac: float = 1.0,
                        min_sep: int = 3) -> int:
    """Smallest FMM level whose near-field reach (min_sep - 1 leaf
    cells) fits inside one rank's slab, so the sharded P2P only needs
    the +-1 neighbor bands: n >= (min_sep - 1) * n_ranks / extent_frac."""
    import math
    need = (min_sep - 1) * n_ranks / max(extent_frac, 1e-9)
    return max(2, int(math.ceil(math.log2(need))))


def fmm_gravity_sharded(x, y, z, m, alive, box: Box, G: float,
                        fc: FmmConfig, eps: float, axis: str,
                        dim: int = 2, band_cap: int = 0,
                        rings: int = 1):
    """Hierarchical multi-chip FMM, called INSIDE shard_map over a 1-D
    spatial decomposition along `dim` (z-slabs / x-column ranges). The
    reference analog is computeGlobalMultipoles
    (ryoanji/interface/global_multipole.hpp:45-66), which exchanges
    focus-tree multipoles instead of sources. Here:

      - far field: each rank P2Ms its OWN particles onto the global
        leaf grid; ONE psum of the [20, n^3] moment stack (n = 2^level,
        ~320 KB at level 4) makes the global multipoles; the M2M/M2L/
        L2L downsweep is dense, grid-sized and cheap, so every rank
        runs it redundantly; L2P evaluates local particles only.
      - near field: P2P pairs reach (min_sep - 1) leaf cells, so each
        rank needs only the boundary BANDS of its +-`rings` neighbors
        along `dim` (fixed-width slabs satisfy rings=1 at
        fc.level >= min_level_for_bands; count-balanced slabs of
        clustered fields may need rings=2-3 — the extents are ordered
        along dim, so the SAME edge band serves every hop). Bands are
        compacted to `band_cap` slots and moved with 2*rings ppermutes
        — per-device memory stays O(local + rings * bands),
        independent of the global N and rank count (the VERDICT r2
        item on the replicated-source O(N)/device dead end).

    Returns (ax, ay, az, pot, nf_trunc, band_overflow) for the local
    rows; the caller psums egrav and fail-stops on the overflow
    counters."""
    _check_psum_budget(fc)
    me = jax.lax.axis_index(axis)
    n_ranks = jax.lax.psum(1, axis)
    cap = x.shape[0]
    if band_cap <= 0:
        band_cap = cap
    n = 1 << fc.level
    mm = jnp.where(alive, m, 0.0)
    cid = _leaf_binning(fc, box, x, y, z, alive)
    co = _box_centered(box, x, y, z)

    # ---- far field: psum'd moment grid + redundant downsweep ----
    mom = jax.lax.psum(_raw_leaf_moments(co, mm, cid, n), axis)
    local = _far_field(mom, box, fc)
    pot_far, ax_far, ay_far, az_far = _l2p(local, co, cid, box, fc)

    # ---- near field: local + neighbor-band P2P ----
    reach = fc.min_sep - 1
    coord = (x, y, z)[dim]
    lo_b = (box.xmin, box.ymin, box.zmin)[dim]
    ln_b = (box.lx, box.ly, box.lz)[dim]
    leaf_d = jnp.clip(((coord - lo_b) / ln_b * n).astype(jnp.int32),
                      0, n - 1)
    big = jnp.int32(2 * n)
    ld = jnp.where(alive, leaf_d, big)
    lo = jnp.min(ld)                      # occupied extent along dim
    hi = jnp.max(jnp.where(alive, leaf_d, -1))

    def compact_band(mask):
        """Park non-band rows, compact band rows to band_cap slots."""
        key = jnp.where(mask, 0, 1).astype(jnp.int32)
        order = jnp.argsort(key, stable=True)
        cnt = jnp.sum(mask)
        idx = order[:band_cap]
        sel = jnp.arange(band_cap) < jnp.minimum(cnt, band_cap)
        return (x[idx], y[idx], z[idx], mm[idx], sel,
                jnp.maximum(cnt - band_cap, 0))

    # conservative bands: everything within `reach` cells of my own
    # occupied extent edge (the neighbor needs cells <= its hi + reach;
    # my lo >= its hi, so sending leaf_d <= lo + reach covers it)
    down = compact_band(alive & (leaf_d <= lo + reach))
    up = compact_band(alive & (leaf_d >= hi - reach))
    band_overflow = down[5] + up[5]

    # ring-coverage fail-stop: the +-rings exchange is only complete
    # when every rank whose occupied extent intersects my [lo-reach,
    # hi+reach] is within `rings` hops. Count-balanced decompositions
    # of clustered data can make central slabs thinner than the reach
    # (then particles rings+1 ranks away are true near-field partners)
    # — that is silently wrong physics, so it must trip the counter;
    # the fixes are a deeper fc.level (see min_level_for_bands) or
    # more rings.
    lo_all = jax.lax.all_gather(lo, axis)
    hi_all = jax.lax.all_gather(hi, axis)
    ranks = jnp.arange(n_ranks)
    needs = (hi_all >= lo - reach) & (lo_all <= hi + reach)
    ring_violation = jnp.sum(needs & (jnp.abs(ranks - me) > rings)
                             & (hi_all >= lo_all))
    band_overflow = band_overflow + ring_violation

    def shift(band, perm, edge_rank_invalid):
        out = [jax.lax.ppermute(v, axis, perm) for v in band[:5]]
        # open boundaries: the wrap-around band is not a real neighbor
        out[4] = out[4] & jnp.logical_not(edge_rank_invalid)
        return out

    # the extents are ordered along dim, so rank me-j's top band
    # contains everything it owns within reach of ANY rank above it —
    # one band definition serves every hop (see docstring)
    recv = []
    for j in range(1, rings + 1):
        perm_up_j = [(i, (i + j) % n_ranks) for i in range(n_ranks)]
        perm_dn_j = [(i, (i - j) % n_ranks) for i in range(n_ranks)]
        recv.append(shift(up, perm_up_j, me < j))            # from me-j
        recv.append(shift(down, perm_dn_j, me >= n_ranks - j))  # me+j

    ux = jnp.concatenate([x] + [b[0] for b in recv])
    uy = jnp.concatenate([y] + [b[1] for b in recv])
    uz = jnp.concatenate([z] + [b[2] for b in recv])
    um = jnp.concatenate([mm] + [jnp.where(b[4], b[3], 0.0) for b in recv])
    ualive = jnp.concatenate([alive] + [b[4] for b in recv])
    ucid = _leaf_binning(fc, box, ux, uy, uz, ualive)

    ax_nf, ay_nf, az_nf, pot_nf, nf_trunc = _p2p(
        ux, uy, uz, um, ucid, n, fc.leaf_cap, eps, reach=reach)

    return (G * (ax_far + ax_nf[:cap]), G * (ay_far + ay_nf[:cap]),
            G * (az_far + az_nf[:cap]), G * (pot_far + pot_nf[:cap]),
            jax.lax.psum(nf_trunc, axis), jax.lax.psum(band_overflow, axis))


def _occupancy_dilated(cid, alive, n: int, reach: int):
    """[n^3] int32 occupancy of `cid`, max-pool dilated by `reach` cells
    (Chebyshev metric) — cell c is marked iff some occupied cell lies
    within the (2*reach+1)^3 window around c."""
    n_leaf = n ** 3
    ones = jnp.where(alive, 1, 0).astype(jnp.int32)
    occ = jax.ops.segment_sum(ones, cid, num_segments=n_leaf + 1)[:n_leaf]
    occ = jnp.minimum(occ, 1)
    d = jax.lax.reduce_window(
        occ.reshape(n, n, n), jnp.int32(0), jax.lax.max,
        (2 * reach + 1,) * 3, (1, 1, 1),
        [(reach, reach)] * 3)
    return occ, d.reshape(n_leaf)


def fmm_gravity_sharded_generic(x, y, z, m, alive, box: Box, G: float,
                                fc: FmmConfig, eps: float, axis: str,
                                band_cap: int = 0):
    """Hierarchical multi-chip FMM for ARBITRARY domain decompositions
    (Hilbert key ranges, blocks, anything) — the fully general analog of
    the reference's focus-tree LET exchange (computeGlobalMultipoles,
    ryoanji/interface/global_multipole.hpp:45-66), replacing the former
    replicated all_gather-every-source path (O(N)/device).

      - far field: identical to fmm_gravity_sharded — each rank P2Ms
        its OWN particles, ONE psum of the dense [20, 8^level] moment
        stack, redundant downsweep, local L2P.
      - near field (boundary-band LET): a rank's particle is needed by
        some OTHER rank iff its leaf cell is within the P2P reach
        (min_sep - 1 cells, Chebyshev) of a cell occupied by that rank.
        Each rank builds the global other-rank occupancy grid (one
        psum of an [8^level] byte map), dilates it by the reach
        (max-pool), and compacts exactly the particles under the
        dilated mask into `band_cap` slots; ONE all_gather moves only
        these boundary bands. Received volume scales with the global
        SURFACE area of the decomposition, not its volume — the LET
        economy, valid for any domain shape (no ring/ordering
        assumption, so no ring-violation mode exists here).

    Fail-stops: band overflow (band bigger than band_cap) and
    near-field truncation are returned as psum'd counters; callers must
    treat nonzero as fatal (silent force errors otherwise).

    Returns (ax, ay, az, pot, nf_trunc, band_overflow) for local rows.
    """
    _check_psum_budget(fc)
    me = jax.lax.axis_index(axis)
    n_ranks = jax.lax.psum(1, axis)
    cap = x.shape[0]
    if band_cap <= 0 or band_cap > cap:
        band_cap = cap   # a band can never exceed the local rows
    n = 1 << fc.level
    n_leaf = n ** 3
    mm = jnp.where(alive, m, 0.0)
    cid = _leaf_binning(fc, box, x, y, z, alive)
    co = _box_centered(box, x, y, z)

    # ---- far field: psum'd moment grid + redundant downsweep ----
    mom = jax.lax.psum(_raw_leaf_moments(co, mm, cid, n), axis)
    local = _far_field(mom, box, fc)
    pot_far, ax_far, ay_far, az_far = _l2p(local, co, cid, box, fc)

    # ---- near field: occupancy-dilation boundary bands ----
    reach = fc.min_sep - 1
    occ_me, dil_me = _occupancy_dilated(cid, alive, n, reach)
    occ_all = jax.lax.psum(occ_me, axis)
    occ_other = jnp.minimum(occ_all - occ_me, 1)
    dil_other = jax.lax.reduce_window(
        occ_other.reshape(n, n, n), jnp.int32(0), jax.lax.max,
        (2 * reach + 1,) * 3, (1, 1, 1), [(reach, reach)] * 3
    ).reshape(n_leaf)

    cid_c = jnp.minimum(cid, n_leaf - 1)
    band_mask = alive & (dil_other[cid_c] > 0)
    key = jnp.where(band_mask, 0, 1).astype(jnp.int32)
    order = jnp.argsort(key, stable=True)
    cnt = jnp.sum(band_mask)
    idx = order[:band_cap]
    sel = jnp.arange(band_cap) < jnp.minimum(cnt, band_cap)
    band_overflow = jnp.maximum(cnt - band_cap, 0).astype(jnp.int32)

    bx = jax.lax.all_gather(x[idx], axis)            # [R, band_cap]
    by = jax.lax.all_gather(y[idx], axis)
    bz = jax.lax.all_gather(z[idx], axis)
    bm = jax.lax.all_gather(jnp.where(sel, mm[idx], 0.0), axis)
    bsel = jax.lax.all_gather(sel, axis)
    # my own band rows are already in the local arrays
    bsel = bsel & (jnp.arange(n_ranks) != me)[:, None]

    ux = jnp.concatenate([x, bx.reshape(-1)])
    uy = jnp.concatenate([y, by.reshape(-1)])
    uz = jnp.concatenate([z, bz.reshape(-1)])
    um = jnp.concatenate([mm, jnp.where(bsel, bm, 0.0).reshape(-1)])
    ualive = jnp.concatenate([alive, bsel.reshape(-1)])
    ucid = _leaf_binning(fc, box, ux, uy, uz, ualive)

    # only cells within reach of MY occupied cells are gathered from;
    # remote band rows parked elsewhere may legally overflow leaf_cap
    ax_nf, ay_nf, az_nf, pot_nf, nf_trunc = _p2p(
        ux, uy, uz, um, ucid, n, fc.leaf_cap, eps, reach=reach,
        trunc_mask=dil_me > 0)

    return (G * (ax_far + ax_nf[:cap]), G * (ay_far + ay_nf[:cap]),
            G * (az_far + az_nf[:cap]), G * (pot_far + pot_nf[:cap]),
            jax.lax.psum(nf_trunc, axis), jax.lax.psum(band_overflow, axis))


def estimate_band_cap(rank_cells: list, level: int, min_sep: int = 3,
                      margin: float = 1.5, align: int = 128) -> int:
    """Host-side band_cap sizing from MEASURED band occupancy (numpy).

    `rank_cells`: per-rank arrays of occupied leaf-cell ids (the initial
    distribution's binning at `level`). For each rank, counts particles
    whose cell lies within the P2P reach of any cell occupied by another
    rank, and returns the padded maximum. The in-graph band-overflow
    fail-stop still guards drift past the margin at runtime."""
    n = 1 << level
    reach = min_sep - 1
    occ = np.zeros((len(rank_cells), n, n, n), bool)
    for r, cells in enumerate(rank_cells):
        c = np.asarray(cells)
        occ[r].reshape(-1)[np.unique(c[(c >= 0) & (c < n ** 3)])] = True
    worst = 0
    for r, cells in enumerate(rank_cells):
        other = occ[[i for i in range(len(occ)) if i != r]].any(0)
        # dilate `other` by reach (Chebyshev) via shifted ORs
        dil = np.zeros_like(other)
        for dx in range(-reach, reach + 1):
            for dy in range(-reach, reach + 1):
                for dz in range(-reach, reach + 1):
                    src = other[
                        max(0, -dx):n - max(0, dx),
                        max(0, -dy):n - max(0, dy),
                        max(0, -dz):n - max(0, dz)]
                    dil[max(0, dx):n - max(0, -dx),
                        max(0, dy):n - max(0, -dy),
                        max(0, dz):n - max(0, -dz)] |= src
        c = np.asarray(cells)
        c = c[(c >= 0) & (c < n ** 3)]
        worst = max(worst, int(dil.reshape(-1)[c].sum()))
    cap = int(np.ceil(worst * margin / align) * align)
    return max(cap, align)


def _p2p(x, y, z, m, cid, n: int, cap: int, eps: float, chunk: int = 4096,
         reach: int = 1, trunc_mask=None):
    """Near-field direct sum: for each particle, all particles in the
    (2*reach+1)^3 surrounding leaf cells (open boundaries: out-of-range
    cells empty). `trunc_mask` ([n^3] bool, optional) restricts the
    overflow fail-stop counter to cells actually gathered from — the
    sharded generic-domain path parks remote band rows in cells far
    from every local target, where overflow is harmless."""
    N = x.shape[0]
    n_leaf = n ** 3
    order = jnp.argsort(cid).astype(INDEX_DTYPE)
    cid_sorted = cid[order]
    cell_start = jnp.searchsorted(
        cid_sorted, jnp.arange(n_leaf + 1, dtype=cid_sorted.dtype)
    ).astype(INDEX_DTYPE)
    # near-field truncation accounting: any leaf holding more than
    # `cap` particles loses its tail from every neighbor's candidate
    # gather below (the jnp.minimum clamp) — count the dropped slots
    leaf_cnt = cell_start[1:] - cell_start[:-1]
    over = jnp.maximum(leaf_cnt.astype(jnp.int32) - cap, 0)
    if trunc_mask is not None:
        over = jnp.where(trunc_mask, over, 0)
    nf_trunc = jnp.sum(over).astype(jnp.int32)
    xs, ys, zs, ms = x[order], y[order], z[order], m[order]
    cs = cid_sorted

    C = min(chunk, N)
    n_chunks = -(-N // C)
    Npad = n_chunks * C
    rr = range(-reach, reach + 1)
    offs = [(dx, dy, dz) for dx in rr for dy in rr for dz in rr]
    M = len(offs) * cap
    eps2 = eps * eps

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
    return tuple(out) + (nf_trunc,)
