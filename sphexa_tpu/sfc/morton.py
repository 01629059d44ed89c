"""Vectorized 3D Morton (Z-order) keys, 30 bits in uint32.

Counterpart of the reference's magic-number Morton codec
(reference: domain/include/cstone/sfc/morton.hpp). We use 10 bits per
dimension packed into uint32 — a 1024^3 grid, which is sufficient for
cell-list ids and domain splits on fixed-capacity arrays. All ops are
elementwise uint32 bit math, so they vectorize on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_LEVEL = 10  # 3 * 10 = 30 bits


def _part1by2(v):
    """Spread the low 10 bits of v so there are two zero bits between each."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _compact1by2(v):
    v = v.astype(jnp.uint32) & jnp.uint32(0x09249249)
    v = (v | (v >> 2)) & jnp.uint32(0x030C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0300F00F)
    v = (v | (v >> 8)) & jnp.uint32(0x030000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def morton_encode(ix, iy, iz):
    """Interleave 10-bit integer coords into a 30-bit Morton key.

    Bit order matches the convention key = x|y|z interleave with x in the
    most significant position of each 3-bit group.
    """
    return (_part1by2(ix) << 2) | (_part1by2(iy) << 1) | _part1by2(iz)


def morton_decode(key):
    key = key.astype(jnp.uint32)
    return _compact1by2(key >> 2), _compact1by2(key >> 1), _compact1by2(key)
