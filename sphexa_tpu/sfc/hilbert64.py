"""Extended-precision 3D Hilbert keys: level 20 (60 bits) as a
(hi, lo) uint32 pair.

The reference uses KeyType=uint64 at 21 levels
(reference: sph/include/sph/types.hpp:39-46, sfc/hilbert.hpp:59) so
domain splits resolve beyond 1024^3 cells at exascale particle counts.
TPUs have no native 64-bit integer lanes, so the TPU-native encoding
keeps the key as TWO uint32 planes ordered lexicographically:

  - Skilling's transpose transform (sfc/hilbert.py) is per-dimension
    bit math on <= 21-bit coords — it never needs 64-bit arithmetic;
  - only the final 3-way interleave exceeds 32 bits, so it is emitted
    as hi = interleave(top 10 bits) (30 bits) and
    lo = interleave(bottom 10 bits) (30 bits): level 20, a 2^20 ~ 1M
    cells-per-dimension grid, 2^60 key values.

Sorting/searching uses (hi, lo) lexicographic order; the domain layer's
histogram splits only consume the top `coarse` bits, so they keep
operating on `hi` unchanged. Level-10 keys embed exactly as hi with
lo = 0 shifted — asserted in tests against sfc/hilbert.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from sphexa_tpu.sfc.hilbert import _axes_to_transpose, _transpose_to_axes
from sphexa_tpu.sfc.morton import morton_decode, morton_encode

MAX_LEVEL64 = 20
_MASK10 = jnp.uint32(0x3FF)


def hilbert_encode64(ix, iy, iz, order: int = MAX_LEVEL64):
    """20-bit integer coords -> (hi, lo) uint32 Hilbert key planes."""
    assert order <= MAX_LEVEL64
    tx, ty, tz = _axes_to_transpose(ix, iy, iz, order)
    hi = morton_encode(tx >> 10, ty >> 10, tz >> 10)
    lo = morton_encode(tx & _MASK10, ty & _MASK10, tz & _MASK10)
    return hi, lo


def hilbert_decode64(hi, lo, order: int = MAX_LEVEL64):
    """(hi, lo) uint32 Hilbert key planes -> 20-bit integer coords."""
    assert order <= MAX_LEVEL64
    txh, tyh, tzh = morton_decode(hi)
    txl, tyl, tzl = morton_decode(lo)
    tx = (txh << 10) | txl
    ty = (tyh << 10) | tyl
    tz = (tzh << 10) | tzl
    return _transpose_to_axes(tx, ty, tz, order)


def key64_less(hi_a, lo_a, hi_b, lo_b):
    """Lexicographic (hi, lo) comparison — the uint64 '<'."""
    return (hi_a < hi_b) | ((hi_a == hi_b) & (lo_a < lo_b))


def sort_by_key64(hi, lo, *arrays):
    """Indirect stable sort by the (hi, lo) key pair: one pass over lo,
    one stable pass over hi (LSD radix over the two planes) — the
    TPU-native uint64 sort."""
    order1 = jnp.argsort(lo, stable=True)
    order2 = jnp.argsort(hi[order1], stable=True)
    perm = order1[order2]
    return (perm,) + tuple(a[perm] for a in arrays)


def keys64_from_positions(box, x, y, z, order: int = MAX_LEVEL64):
    """Positions -> (hi, lo) key planes on the global box (the
    computeSfcKeys analog, sfc/sfc.hpp:284, at 64-bit precision)."""
    from sphexa_tpu.sfc.box import normalize_coords

    nx, ny, nz = normalize_coords(box, x, y, z)
    side = 1 << order
    ix = jnp.minimum((nx * side).astype(jnp.uint32), side - 1)
    iy = jnp.minimum((ny * side).astype(jnp.uint32), side - 1)
    iz = jnp.minimum((nz * side).astype(jnp.uint32), side - 1)
    return hilbert_encode64(ix, iy, iz, order)
