"""Hilbert-range load-balanced domain decomposition over a Mesh axis.

TPU-native counterpart of the reference's SFC assignment + particle
exchange + halo machinery (reference:
domain/include/cstone/domain/assignment.hpp:55 `GlobalAssignment`,
domaindecomp.hpp `singleRangeSfcSplit` (+-1% balance),
domaindecomp_mpi.hpp:86 `exchangeParticles`,
halos/halos.hpp:118 discover/computeLayout/exchangeHalos). The mapping:

  bucket-count global octree   ->  fixed 2^b-bin Hilbert key histogram,
                                   psum-reduced, split at count quantiles
  exchangeParticles (P2P)      ->  jax.lax.all_to_all of fixed-capacity
                                   per-destination buffers (lossless by
                                   construction: every rank reachable;
                                   capacity overflow is counted and must
                                   fail-stop the run)
  halo discovery (tree walk)   ->  coarse occupancy bitmaps, all_gather,
                                   27-cell dilation; a particle is sent
                                   to every rank whose dilated bitmap
                                   covers its coarse cell
  exchangeHalos per stage      ->  all_to_all re-send of the packed
                                   band indices with new payloads

Unlike the round-1 fixed-width slab ring (domain/slab.py), ranges adapt
to the density field (imbalance bounded by one histogram bin) and halo
exchange is all-neighbor, not just +-1 ring.

On peer pruning (reference findPeersMac, traversal/peers.hpp:63): the
reference prunes MPI peers because point-to-point lanes cost per-pair
setup and the octree walk makes the peer set cheap to compute. On TPU
the equivalent primitive IS `all_to_all` — XLA schedules it as an ICI
collective whose cost is dominated by the BYTES moved, and ranks that
have nothing for each other contribute zero-filled (compressible)
slices. But the all_to_all EXTENDED FRAME is cap + D*halo_cap — it
grows with rank count even though each rank's true halo count is
O(surface), set by its O(1) spatial peers. (A +-k curve-hop ring is
NOT the answer here: measured on uniform/filament/slab geometries,
per-rank Hilbert ranges interleave enough that peers sit up to D/2
hops away — curve distance does not bound spatial adjacency, which is
exactly why the reference computes peer lists from the tree.)
`halo_pool=P` is the TPU-native fix: the all_to_all stays (its
transient [D, halo_cap] buffer is freed after each exchange), but the
received rows are COMPACTED into a pooled frame of P slots, so the
persistent extended frame — the thing all five pair stages and the
neighbor structure live on — is cap + P, independent of D. P budgets
the rank's TOTAL halo count (vs halo_cap budgeting the max PER-PAIR
count); pool overflow is counted into the lost fail-stop.

All functions here run *inside* shard_map over AXIS.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sphexa_tpu.config import INDEX_DTYPE, KEY_DTYPE
from sphexa_tpu.domain.slab import _pack, _pack_indices
from sphexa_tpu.sfc.box import Box, normalize_coords
from sphexa_tpu.sfc.hilbert import MAX_LEVEL, hilbert_encode
from sphexa_tpu.state import Particles, _FIELDS

AXIS = "dom"
KEY_BITS = 3 * MAX_LEVEL  # 30


@dataclasses.dataclass(frozen=True)
class HilbertConfig:
    n_ranks: int
    cap: int            # owned-particle capacity per device
    halo_cap: int       # halo slots per (src, dst) pair
    mig_cap: int        # migration slots per (src, dst) pair
    split_bits: int = 13   # histogram bins = 2^split_bits
    coarse: int = 16       # coarse halo-discovery grid cells per dim
    dilate: int = 1        # halo dilation radius in coarse cells; halo
                           # completeness needs dilate * cell_edge >= r_halo
    key64: bool = False    # level-20 (hi, lo)-uint32 keys + MSD radix
                           # select splits (the KeyType=uint64 analog,
                           # types.hpp:39-46) — keeps balance when
                           # clusters alias whole 30-bit key cells
    halo_pool: int = 0     # 0 = dense extended frame (cap + D*halo_cap
                           # halo slots); P>0 = received halos compacted
                           # into a pooled frame of P slots, so the
                           # persistent extended frame is cap + P,
                           # INDEPENDENT of n_ranks (the findPeersMac
                           # peer-economy analog, traversal/peers.hpp:63
                           # — P budgets the total halo count set by the
                           # rank's O(1) spatial peers). Pool overflow
                           # is counted and must fail-stop the run.

    @property
    def n_halo_slots(self) -> int:
        """Halo slots in the persistent extended frame."""
        return self.halo_pool or self.n_ranks * self.halo_cap

    @property
    def ext(self) -> int:
        """Extended frame: owned + (dense or pooled) halo slots."""
        return self.cap + self.n_halo_slots


def hilbert_keys(box: Box, x, y, z):
    """30-bit Hilbert keys from positions (reference: sfc/sfc.hpp:284)."""
    nx, ny, nz = normalize_coords(box, x, y, z)
    scale = float(1 << MAX_LEVEL)
    ix = jnp.minimum((nx * scale).astype(jnp.int32), (1 << MAX_LEVEL) - 1)
    iy = jnp.minimum((ny * scale).astype(jnp.int32), (1 << MAX_LEVEL) - 1)
    iz = jnp.minimum((nz * scale).astype(jnp.int32), (1 << MAX_LEVEL) - 1)
    return hilbert_encode(ix, iy, iz)


def balance_splits(keys, alive, hc: HilbertConfig):
    """Global key-histogram quantile split: rank d owns keys in
    [splits[d], splits[d+1]) with splits[0]=0, splits[D]=2^30
    (reference: domaindecomp.hpp singleRangeSfcSplit). Returns uint32
    boundaries [D+1]; balance error is bounded by the largest histogram
    bin."""
    nbins = 1 << hc.split_bits
    shift = KEY_BITS - hc.split_bits
    bins = (keys >> shift).astype(jnp.int32)
    hist = jnp.zeros((nbins,), jnp.float32).at[bins].add(
        alive.astype(jnp.float32), mode="drop")
    hist = jax.lax.psum(hist, AXIS)
    cum = jnp.cumsum(hist)
    total = cum[-1]
    d = jnp.arange(1, hc.n_ranks, dtype=jnp.float32)
    targets = total * d / hc.n_ranks
    cut_bins = jnp.searchsorted(cum, targets, side="left") + 1
    inner = (cut_bins.astype(KEY_DTYPE) << shift)
    return jnp.concatenate([jnp.zeros((1,), KEY_DTYPE), inner,
                            jnp.full((1,), 1 << KEY_BITS, KEY_DTYPE)])


def owner_of(keys, splits):
    """Rank owning each key (searchsorted over the split boundaries)."""
    return (jnp.searchsorted(splits[1:-1], keys, side="right")
            ).astype(INDEX_DTYPE)


def balance_splits64(hi, lo, alive, hc: HilbertConfig):
    """Level-20 (60-bit) quantile splits by MSD radix select — the
    KeyType=uint64 singleRangeSfcSplit analog (reference:
    sph/include/sph/types.hpp:39-46, domaindecomp.hpp) without 64-bit
    integer lanes: six psum'd 10-bit-window histogram passes narrow
    every cut to an EXACT 60-bit boundary, so balance error is bounded
    by the largest exact-key tie instead of a histogram bin. This is
    what keeps clustered fields balanced past the 1024^3 resolution of
    the 30-bit keys (beyond it, whole clusters alias to one 30-bit key
    and no 30-bit split can separate them).

    Returns (splits_hi, splits_lo): [D - 1] inner boundaries; rank d
    owns keys in [split_{d-1}, split_d) lexicographically."""
    D = hc.n_ranks
    ncut = D - 1
    n_alive = jnp.sum(alive.astype(jnp.int32))
    total = jax.lax.psum(n_alive, AXIS)
    remaining = (total * jnp.arange(1, D, dtype=jnp.int32)) // D

    windows = [((hi >> 20) & 1023).astype(jnp.int32),
               ((hi >> 10) & 1023).astype(jnp.int32),
               (hi & 1023).astype(jnp.int32),
               ((lo >> 20) & 1023).astype(jnp.int32),
               ((lo >> 10) & 1023).astype(jnp.int32),
               (lo & 1023).astype(jnp.int32)]
    pm = jnp.broadcast_to(alive[:, None], (alive.shape[0], ncut))
    decided = []
    for w in windows:
        hists = []
        for c in range(ncut):
            hists.append(jnp.zeros((1024,), jnp.float32).at[w].add(
                jnp.where(pm[:, c], 1.0, 0.0), mode="drop"))
        hist = jax.lax.psum(jnp.stack(hists), AXIS)       # [ncut, 1024]
        cum = jnp.cumsum(hist, axis=1)
        rem_f = remaining.astype(jnp.float32)
        # bin HOLDING the remaining'th key (0-indexed) of the subset:
        # cum[b-1] <= rem < cum[b]; the assembled boundary is then the
        # exact 60-bit value of that key (ties go right, undershoot
        # bounded by the tie-group size)
        binsel = jnp.sum((cum <= rem_f[:, None] + 0.5).astype(jnp.int32),
                         axis=1)
        binsel = jnp.minimum(binsel, 1023)
        below = jnp.where(binsel > 0,
                          jnp.take_along_axis(
                              cum, jnp.maximum(binsel - 1, 0)[:, None],
                              axis=1)[:, 0], 0.0)
        remaining = remaining - below.astype(jnp.int32)
        decided.append(binsel)
        pm = pm & (w[:, None] == binsel[None, :])
    d = [x.astype(jnp.uint32) for x in decided]
    splits_hi = (d[0] << 20) | (d[1] << 10) | d[2]
    splits_lo = (d[3] << 20) | (d[4] << 10) | d[5]
    return splits_hi, splits_lo


def owner_of64(hi, lo, splits_hi, splits_lo):
    """Rank owning each (hi, lo) key: lexicographic comparison against
    the D-1 inner boundaries (keys equal to a boundary go right, the
    owner_of side='right' convention)."""
    from sphexa_tpu.sfc.hilbert64 import key64_less
    ge = ~key64_less(hi[:, None], lo[:, None],
                     splits_hi[None, :], splits_lo[None, :])
    return jnp.sum(ge.astype(INDEX_DTYPE), axis=1)


def _all2all(x):
    return jax.lax.all_to_all(x, AXIS, split_axis=0, concat_axis=0)


def migrate(ps: Particles, box: Box, splits, hc: HilbertConfig,
            owner=None):
    """Send every particle to its Hilbert-range owner via one all_to_all
    (reference: domaindecomp_mpi.hpp:86 exchangeParticles). Lossless by
    construction — every rank is reachable in one hop; only a capacity
    overflow can drop particles, and that is counted in `lost` and must
    fail-stop the run. `owner` overrides the Hilbert-key ownership (the
    balanced column-range domain passes grid-column owners)."""
    me = jax.lax.axis_index(AXIS)
    if owner is None:
        keys = hilbert_keys(box, ps.x, ps.y, ps.z)
        owner = owner_of(keys, splits)
    stay = ps.alive & (owner == me)

    fields = [getattr(ps, f) for f in _FIELDS[:-1]]
    D = hc.n_ranks

    send = [[] for _ in fields]
    counts = []
    lost_cap = jnp.int32(0)
    for d in range(D):
        # rows with owner==me are never packed (stay handled below)
        go = ps.alive & (owner == d) & ~stay
        buf, n_d = _pack(go, fields, hc.mig_cap)
        lost_cap = lost_cap + (jnp.sum(go.astype(jnp.int32)) - n_d)
        for k in range(len(fields)):
            send[k].append(buf[k])
        counts.append(n_d)
    send = [jnp.stack(bufs) for bufs in send]          # [D, mig_cap]
    counts = jnp.stack(counts)                         # [D]

    recv = [_all2all(b) for b in send]
    counts_r = _all2all(counts.reshape(D, 1))[:, 0]

    surv, n_surv = _pack(stay, fields, hc.cap)
    new_fields = []
    offsets = n_surv + jnp.concatenate(
        [jnp.zeros((1,), counts_r.dtype), jnp.cumsum(counts_r)[:-1]])
    for k, f in enumerate(surv):
        acc = jnp.concatenate([f, jnp.zeros((D * hc.mig_cap,), f.dtype)])
        for d in range(D):
            acc = jax.lax.dynamic_update_slice(acc, recv[k][d],
                                               (offsets[d],))
        new_fields.append(acc[:hc.cap])
    n_own = n_surv + jnp.sum(counts_r)
    lost_ovf = jnp.maximum(n_own - hc.cap, 0)
    n_own = jnp.minimum(n_own, hc.cap)
    alive = jnp.arange(hc.cap, dtype=INDEX_DTYPE) < n_own

    ps = Particles(alive=alive, **dict(zip(_FIELDS[:-1], new_fields)))
    ps = ps.replace(h=jnp.where(alive, ps.h, 1.0))
    return ps, lost_cap + lost_ovf, n_own


class HaloMaps(NamedTuple):
    send_idx: jnp.ndarray     # [D, halo_cap] owned rows bound for rank d
    send_valid: jnp.ndarray   # [D, halo_cap]
    pool_src: jnp.ndarray     # [n_halo_slots] received-row index feeding
                              # each frame halo slot (identity when dense)
    pool_valid: jnp.ndarray   # [n_halo_slots] validity of frame halo slots
    send_lost: jnp.ndarray    # per-pair capacity + pool overflow count


def _coarse_cells(box: Box, hc: HilbertConfig, x, y, z):
    G = hc.coarse
    nx, ny, nz = normalize_coords(box, x, y, z)
    ix = jnp.minimum((nx * G).astype(jnp.int32), G - 1)
    iy = jnp.minimum((ny * G).astype(jnp.int32), G - 1)
    iz = jnp.minimum((nz * G).astype(jnp.int32), G - 1)
    return (ix * G + iy) * G + iz


def discover_halos(ps: Particles, box: Box, hc: HilbertConfig):
    """Coarse-bitmap halo discovery (replaces the reference's octree
    collision walk, traversal/collisions.hpp:79): rank e needs particle
    p iff p's coarse cell touches e's dilated occupancy bitmap. Requires
    coarse cell edge >= r_halo — the propagator checks this via
    `halo_frac` in its diagnostics. Dilation wraps in every dimension;
    for open boundaries that only over-sends (distance masks discard)."""
    G = hc.coarse
    D = hc.n_ranks
    me = jax.lax.axis_index(AXIS)
    cid = _coarse_cells(box, hc, ps.x, ps.y, ps.z)

    occ = jnp.zeros((G * G * G,), jnp.float32).at[cid].add(
        ps.alive.astype(jnp.float32), mode="drop")
    occ_all = jax.lax.all_gather(occ, AXIS)            # [D, G^3]
    occ3 = (occ_all > 0).reshape(D, G, G, G)
    dil = occ3
    for ax in (1, 2, 3):
        acc = dil
        for s in range(1, hc.dilate + 1):
            acc = acc | jnp.roll(dil, s, ax) | jnp.roll(dil, -s, ax)
        dil = acc
    dil = dil.reshape(D, G * G * G)

    send_idx = []
    send_valid = []
    counts = []
    lost = jnp.int32(0)
    lane = jnp.arange(hc.halo_cap, dtype=INDEX_DTYPE)
    for d in range(D):
        need = ps.alive & dil[d][cid] & (me != d)
        idx, n_d = _pack_indices(need, hc.halo_cap)
        lost = lost + (jnp.sum(need.astype(jnp.int32)) - n_d)
        send_idx.append(idx)
        send_valid.append(lane < n_d)
        counts.append(n_d)
    send_idx = jnp.stack(send_idx)
    send_valid = jnp.stack(send_valid)
    counts_r = _all2all(jnp.stack(counts).reshape(D, 1))[:, 0]
    halo_valid = (lane[None, :] < counts_r[:, None]).reshape(-1)
    if hc.halo_pool:
        # compact the received rows into the pooled frame slots: the
        # persistent extended frame holds hc.halo_pool halo slots
        # regardless of D (peer-economy; module docstring). Overflow of
        # the pool budget joins the lost fail-stop.
        pool_src, n_pool = _pack_indices(halo_valid, hc.halo_pool)
        lost = lost + (jnp.sum(halo_valid.astype(jnp.int32)) - n_pool)
        pool_valid = jnp.arange(hc.halo_pool, dtype=INDEX_DTYPE) < n_pool
    else:
        pool_src = jnp.arange(D * hc.halo_cap, dtype=INDEX_DTYPE)
        pool_valid = halo_valid
    return HaloMaps(send_idx=send_idx, send_valid=send_valid,
                    pool_src=pool_src, pool_valid=pool_valid,
                    send_lost=lost)


def refresh_halo_fields(fields: tuple, maps: HaloMaps, hc: HilbertConfig,
                        inv_perm=None):
    """Re-send the packed halo bands with new payloads — the analog of
    the reference's per-stage exchangeHalos (ve_hydro.hpp:156-187).
    `fields` live on the extended frame [cap + n_halo_slots], optionally
    permuted (pass inv_perm: ext -> frame)."""

    def ext_to_frame(i):
        return i if inv_perm is None else inv_perm[i]

    send_rows = ext_to_frame(maps.send_idx)
    halo_rows = ext_to_frame(
        hc.cap + jnp.arange(hc.n_halo_slots, dtype=INDEX_DTYPE))

    out = []
    for f in fields:
        payload = jnp.where(maps.send_valid, f[send_rows], 0.0)
        got = _all2all(payload).reshape(-1)[maps.pool_src]
        f = f.at[halo_rows].set(
            jnp.where(maps.pool_valid, got, f[halo_rows]))
        out.append(f)
    return tuple(out)


def exchange_halos(ps: Particles, box: Box, hc: HilbertConfig):
    """Build the extended frame [cap + n_halo_slots] of every conserved
    field plus the maps for later refreshes."""
    maps = discover_halos(ps, box, hc)

    ext_fields = {}
    for name in _FIELDS[:-1]:
        f = getattr(ps, name)
        payload = jnp.where(maps.send_valid, f[maps.send_idx], 0.0)
        got = _all2all(payload).reshape(-1)[maps.pool_src]
        ext_fields[name] = jnp.concatenate([f, got])
    ext_alive = jnp.concatenate([ps.alive, maps.pool_valid])
    ext_fields["h"] = jnp.where(ext_alive, ext_fields["h"], 1.0)
    return Particles(alive=ext_alive, **ext_fields), maps
