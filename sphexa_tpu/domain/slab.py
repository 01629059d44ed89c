"""Multi-chip slab domain decomposition over a jax.sharding Mesh.

TPU-native counterpart of the reference's distributed Domain
(reference: domain/include/cstone/domain/domain.hpp:66 — SFC assignment,
particle migration, halo discovery and P2P exchange). The mapping:

  MPI rank                ->  mesh position along the "slab" axis
  SFC-split assignment    ->  contiguous z-slabs of the global box
  exchangeParticles (P2P) ->  ppermute of fixed-capacity migration buffers
  halo discovery + P2P    ->  ppermute of boundary bands within 2*h_max
  Allreduce (dt, box, E)  ->  pmin / psum over the mesh axis

Everything is fixed-shape: each device owns `cap` particle slots (alive-
masked) plus 2*halo_cap halo slots. Migration moves particles at most
one slab per step (enforced by the Courant condition in practice and
reported in diagnostics). Per-stage halo *field refreshes* reuse the
band membership computed at sync time, exactly like the reference's
repeated exchangeHalos calls with different payloads
(reference: main/src/propagator/ve_hydro.hpp:156-187).

All functions here run *inside* shard_map: they see local shards and
communicate with jax.lax collectives.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sphexa_tpu.config import INDEX_DTYPE
from sphexa_tpu.sfc.box import Box, Boundary
from sphexa_tpu.state import Particles, _FIELDS

AXIS = "slab"


@dataclasses.dataclass(frozen=True)
class SlabConfig:
    n_slabs: int
    cap: int          # owned-particle capacity per device
    halo_cap: int     # halo slots per side
    mig_cap: int      # migration slots per side per step

    @property
    def ext(self) -> int:
        """Extended array length: owned + left halos + right halos."""
        return self.cap + 2 * self.halo_cap


def slab_bounds(box: Box, n_slabs: int):
    width = box.lz / n_slabs
    return width


def slab_of(box: Box, sc: SlabConfig, z):
    width = box.lz / sc.n_slabs
    s = jnp.floor((z - box.zmin) / width).astype(INDEX_DTYPE)
    return jnp.clip(s, 0, sc.n_slabs - 1)


def _pack(mask, values_list, cap: int, fill=0.0):
    """Compact masked rows into a fixed-capacity buffer (order preserving).
    Returns (packed list, count). Rows beyond cap are dropped."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(INDEX_DTYPE)) - 1
    pos = jnp.where(mask & (pos < cap), pos, cap)
    count = jnp.minimum(jnp.sum(mask.astype(INDEX_DTYPE)), cap)
    outs = []
    for v in values_list:
        buf = jnp.full((cap + 1,) + v.shape[1:], fill, v.dtype)
        outs.append(buf.at[pos].set(v, mode="drop")[:cap])
    return outs, count


def _pack_indices(mask, cap: int):
    """Indices of masked rows, packed to fixed capacity. Returns
    (idx[cap], count); padding rows point at slot 0."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(INDEX_DTYPE)) - 1
    pos = jnp.where(mask & (pos < cap), pos, cap)
    count = jnp.minimum(jnp.sum(mask.astype(INDEX_DTYPE)), cap)
    idx = jnp.zeros((cap + 1,), INDEX_DTYPE)
    rows = jnp.arange(n, dtype=INDEX_DTYPE)
    idx = idx.at[pos].set(rows, mode="drop")[:cap]
    return idx, count


def _shift(x, direction: int, n_slabs: int):
    """ppermute by +/-1 along the slab ring. direction=+1 sends to the
    right neighbor (higher z)."""
    perm = [(i, (i + direction) % n_slabs) for i in range(n_slabs)]
    return jax.lax.ppermute(x, AXIS, perm)


class HaloMaps(NamedTuple):
    """Index maps (in the device-local extended frame) driving per-stage
    halo field refreshes."""
    send_lo_idx: jnp.ndarray   # [H] my owned rows forming the low-z band
    send_hi_idx: jnp.ndarray   # [H] my owned rows forming the high-z band
    n_send_lo: jnp.ndarray
    n_send_hi: jnp.ndarray
    halo_left_valid: jnp.ndarray   # [H] validity of left-halo slots
    halo_right_valid: jnp.ndarray  # [H]


def migrate(ps: Particles, box: Box, sc: SlabConfig, extras=None):
    """Move owned particles whose z left my slab to the adjacent device.

    `extras`: optional tuple of additional per-particle payload columns
    (e.g. the BDT kick interval, global ids) that travel with the rows
    — the analog of the reference's exchangeParticles moving every
    registered field (domaindecomp_mpi.hpp:86).

    Returns (particles, lost), or (particles, extras_out, lost) when
    extras are given; lost counts particles that needed to move more
    than one slab or overflowed capacity (diagnostic; should be 0 in a
    healthy run).
    """
    me = jax.lax.axis_index(AXIS)
    tgt = slab_of(box, sc, ps.z)
    stay = ps.alive & (tgt == me)
    go_r = ps.alive & (tgt == ((me + 1) % sc.n_slabs))
    go_l = ps.alive & (tgt == ((me - 1) % sc.n_slabs))
    if sc.n_slabs == 2:
        # both directions reach the same (only) neighbor: a mover must
        # travel exactly once (cf. the same guard in exchange_halos)
        go_l = go_l & ~go_r
    lost_far = jnp.sum(ps.alive & ~(stay | go_r | go_l))

    n_std = len(_FIELDS) - 1
    fields = [getattr(ps, f) for f in _FIELDS[:-1]] + list(extras or ())

    buf_r, n_r = _pack(go_r, fields, sc.mig_cap)
    buf_l, n_l = _pack(go_l, fields, sc.mig_cap)
    lost_cap = (jnp.sum(go_r.astype(jnp.int32)) - n_r
                + jnp.sum(go_l.astype(jnp.int32)) - n_l)

    # ring exchange; non-periodic z: wrap-around receives are discarded
    recv_from_l = [_shift(b, +1, sc.n_slabs) for b in buf_r]
    n_from_l = _shift(n_r, +1, sc.n_slabs)
    recv_from_r = [_shift(b, -1, sc.n_slabs) for b in buf_l]
    n_from_r = _shift(n_l, -1, sc.n_slabs)

    if box.bz != Boundary.periodic:
        n_from_l = jnp.where(me == 0, 0, n_from_l)
        n_from_r = jnp.where(me == sc.n_slabs - 1, 0, n_from_r)

    # compact survivors, then append received
    surv, n_surv = _pack(stay, fields, sc.cap)
    new_fields = []
    lane = jnp.arange(sc.mig_cap, dtype=INDEX_DTYPE)
    for k, f in enumerate(surv):
        f = jax.lax.dynamic_update_slice(
            jnp.concatenate([f, jnp.zeros((2 * sc.mig_cap,), f.dtype)]),
            recv_from_l[k], (n_surv,))
        f = jax.lax.dynamic_update_slice(f, recv_from_r[k], (n_surv + n_from_l,))
        new_fields.append(f[:sc.cap])
    n_own = n_surv + n_from_l + n_from_r
    lost_ovf = jnp.maximum(n_own - sc.cap, 0)
    n_own = jnp.minimum(n_own, sc.cap)
    alive = jnp.arange(sc.cap, dtype=INDEX_DTYPE) < n_own

    ps = Particles(alive=alive,
                   **dict(zip(_FIELDS[:-1], new_fields[:n_std])))
    # keep padding geometry benign
    ps = ps.replace(h=jnp.where(alive, ps.h, 1.0))
    lost = lost_far + lost_cap + lost_ovf
    if extras is None:
        return ps, lost
    return ps, tuple(new_fields[n_std:]), lost


def exchange_halos(ps: Particles, box: Box, sc: SlabConfig, r_halo):
    """Build the extended array [cap + 2H]: owned + left/right halo bands
    of every conserved field, and the maps for later field refreshes.

    r_halo: scalar search-radius bound (2*h_max enlarged), traced value.
    """
    me = jax.lax.axis_index(AXIS)
    width = box.lz / sc.n_slabs
    z_lo = box.zmin + width * me.astype(jnp.float32)
    z_hi = z_lo + width

    band_lo = ps.alive & (ps.z < z_lo + r_halo)
    band_hi = ps.alive & (ps.z >= z_hi - r_halo)
    if sc.n_slabs == 1:
        # min-image folding already covers self-periodicity: no halos
        band_lo = band_hi = jnp.zeros_like(band_lo)
    elif sc.n_slabs == 2:
        # left and right neighbor are the same device: each particle must
        # arrive there at most once (min-image folding handles both sides)
        band_hi = band_hi & ~band_lo

    send_lo_idx, n_send_lo = _pack_indices(band_lo, sc.halo_cap)
    send_hi_idx, n_send_hi = _pack_indices(band_hi, sc.halo_cap)

    fields = [getattr(ps, f) for f in _FIELDS[:-1]]
    lane = jnp.arange(sc.halo_cap, dtype=INDEX_DTYPE)

    # halo from left neighbor = their hi band (they send right, shift +1)
    halo_from_l = [_shift(f[send_hi_idx], +1, sc.n_slabs) for f in fields]
    n_halo_l = _shift(n_send_hi, +1, sc.n_slabs)
    halo_from_r = [_shift(f[send_lo_idx], -1, sc.n_slabs) for f in fields]
    n_halo_r = _shift(n_send_lo, -1, sc.n_slabs)

    if box.bz != Boundary.periodic:
        n_halo_l = jnp.where(me == 0, 0, n_halo_l)
        n_halo_r = jnp.where(me == sc.n_slabs - 1, 0, n_halo_r)

    halo_left_valid = lane < n_halo_l
    halo_right_valid = lane < n_halo_r

    ext_fields = {}
    for name, f, hl, hr in zip(_FIELDS[:-1], fields, halo_from_l, halo_from_r):
        ext_fields[name] = jnp.concatenate([f, hl, hr])
    ext_alive = jnp.concatenate([ps.alive, halo_left_valid, halo_right_valid])
    # benign padding geometry for invalid halo slots
    ext_fields["h"] = jnp.where(ext_alive, ext_fields["h"], 1.0)

    ext = Particles(alive=ext_alive, **ext_fields)
    maps = HaloMaps(send_lo_idx, send_hi_idx, n_send_lo, n_send_hi,
                    halo_left_valid, halo_right_valid)
    return ext, maps


def refresh_halo_fields(fields: tuple, maps: HaloMaps, sc: SlabConfig,
                        perm=None, inv_perm=None):
    """Refresh halo slots of per-stage computed fields, mirroring the
    reference's mid-pipeline exchangeHalos calls.

    `fields` are arrays over the extended frame, possibly permuted by a
    cell sort: if so, pass perm (sorted <- ext) and inv_perm (ext ->
    sorted) so band gathers and halo scatters address the right rows.
    Returns refreshed fields (same frame as input).
    """
    H = sc.halo_cap

    def ext_to_frame(i):
        return i if inv_perm is None else inv_perm[i]

    lo_rows = ext_to_frame(maps.send_lo_idx)
    hi_rows = ext_to_frame(maps.send_hi_idx)
    halo_l_rows = ext_to_frame(sc.cap + jnp.arange(H, dtype=INDEX_DTYPE))
    halo_r_rows = ext_to_frame(sc.cap + H + jnp.arange(H, dtype=INDEX_DTYPE))

    out = []
    for f in fields:
        from_l = _shift(f[hi_rows], +1, sc.n_slabs)
        from_r = _shift(f[lo_rows], -1, sc.n_slabs)
        f = f.at[halo_l_rows].set(
            jnp.where(maps.halo_left_valid, from_l, f[halo_l_rows]))
        f = f.at[halo_r_rows].set(
            jnp.where(maps.halo_right_valid, from_r, f[halo_r_rows]))
        out.append(f)
    return tuple(out)
