"""SFC codec tests, mirroring the reference unit-test strategy
(reference: domain/test/unit/sfc/hilbert.cpp, morton.cpp — encode/decode
inversion and curve-continuity properties)."""

import jax.numpy as jnp
import numpy as np

from sphexa_tpu.sfc.morton import morton_encode, morton_decode
from sphexa_tpu.sfc.hilbert import hilbert_encode, hilbert_decode


def rand_coords(n, rng, bits=10):
    return [jnp.asarray(rng.integers(0, 1 << bits, n), jnp.uint32) for _ in range(3)]


def test_morton_roundtrip():
    rng = np.random.default_rng(42)
    ix, iy, iz = rand_coords(10000, rng)
    kx, ky, kz = morton_decode(morton_encode(ix, iy, iz))
    np.testing.assert_array_equal(np.asarray(kx), np.asarray(ix))
    np.testing.assert_array_equal(np.asarray(ky), np.asarray(iy))
    np.testing.assert_array_equal(np.asarray(kz), np.asarray(iz))


def test_morton_order():
    # Morton key of (1,0,0) > (0,1,0) > (0,0,1): x is the most significant
    one = jnp.asarray([1], jnp.uint32)
    zero = jnp.asarray([0], jnp.uint32)
    kx = int(morton_encode(one, zero, zero)[0])
    ky = int(morton_encode(zero, one, zero)[0])
    kz = int(morton_encode(zero, zero, one)[0])
    assert kx == 4 and ky == 2 and kz == 1


def test_hilbert_roundtrip():
    rng = np.random.default_rng(7)
    ix, iy, iz = rand_coords(10000, rng)
    kx, ky, kz = hilbert_decode(hilbert_encode(ix, iy, iz))
    np.testing.assert_array_equal(np.asarray(kx), np.asarray(ix))
    np.testing.assert_array_equal(np.asarray(ky), np.asarray(iy))
    np.testing.assert_array_equal(np.asarray(kz), np.asarray(iz))


def test_hilbert_continuity():
    """The defining property of a Hilbert curve: consecutive keys decode to
    cells exactly one grid step apart (L1 distance 1)."""
    keys = jnp.arange(0, 1 << 15, dtype=jnp.uint32)
    x, y, z = hilbert_decode(keys)
    x, y, z = (np.asarray(v).astype(np.int64) for v in (x, y, z))
    d = np.abs(np.diff(x)) + np.abs(np.diff(y)) + np.abs(np.diff(z))
    assert (d == 1).all()


def test_hilbert_full_coverage():
    """All keys in [0, 8^k) decode to distinct cells of the 2^k grid."""
    keys = jnp.arange(0, 8 ** 4, dtype=jnp.uint32)
    x, y, z = hilbert_decode(keys)
    lin = (np.asarray(x).astype(np.int64) * 16 + np.asarray(y)) * 16 + np.asarray(z)
    assert len(np.unique(lin)) == 8 ** 4


def test_hilbert64_roundtrip_and_order():
    """Level-20 (hi, lo) pair codec: encode/decode inversion, curve
    continuity, and lexicographic consistency with the 30-bit codec on
    shared prefixes (the reference's KeyType=uint64 role,
    sph/types.hpp:39-46)."""
    import numpy as np

    from sphexa_tpu.sfc.hilbert import hilbert_encode
    from sphexa_tpu.sfc.hilbert64 import (hilbert_decode64, hilbert_encode64,
                                          key64_less, sort_by_key64)

    rng = np.random.default_rng(2)
    n = 4096
    side = 1 << 20
    ix = jnp.asarray(rng.integers(0, side, n, dtype=np.uint32))
    iy = jnp.asarray(rng.integers(0, side, n, dtype=np.uint32))
    iz = jnp.asarray(rng.integers(0, side, n, dtype=np.uint32))
    hi, lo = hilbert_encode64(ix, iy, iz)
    jx, jy, jz = hilbert_decode64(hi, lo)
    np.testing.assert_array_equal(np.asarray(jx), np.asarray(ix))
    np.testing.assert_array_equal(np.asarray(jy), np.asarray(iy))
    np.testing.assert_array_equal(np.asarray(jz), np.asarray(iz))

    # hi plane == the level-10 key of the coarse coords (prefix property)
    hi10 = hilbert_encode(ix >> 10, iy >> 10, iz >> 10)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(hi10))

    # Hilbert continuity: consecutive keys are unit-distance neighbors.
    # Walk keys 0..N-1 by decoding; each step moves exactly one axis by 1
    N = 1 << 12
    ks = jnp.arange(N, dtype=jnp.uint32)
    hi_w = jnp.zeros(N, jnp.uint32)
    wx, wy, wz = hilbert_decode64(hi_w, ks)
    d = (np.abs(np.diff(np.asarray(wx).astype(int)))
         + np.abs(np.diff(np.asarray(wy).astype(int)))
         + np.abs(np.diff(np.asarray(wz).astype(int))))
    assert (d == 1).all()

    # two-plane radix sort == lexicographic (hi, lo) order
    perm, hs, ls = sort_by_key64(hi, lo, hi, lo)
    hs, ls = np.asarray(hs), np.asarray(ls)
    lex = np.lexsort((np.asarray(lo), np.asarray(hi)))
    np.testing.assert_array_equal(np.asarray(perm), lex)
    less = key64_less(jnp.asarray(hs[:-1]), jnp.asarray(ls[:-1]),
                      jnp.asarray(hs[1:]), jnp.asarray(ls[1:]))
    eq = (hs[:-1] == hs[1:]) & (ls[:-1] == ls[1:])
    assert (np.asarray(less) | eq).all()
