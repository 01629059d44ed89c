"""Direct-sum N^2 gravity (reference: ryoanji/src/ryoanji/nbody/direct.cuh).

Plummer-softened all-pairs forces + potential, chunked over targets to
bound memory. Serves as the oracle for the tree solver and as the
production path for small N. The j-loop is a dense [C, N] tile — on TPU
this streams at full VPU rate (no gathers)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sphexa_tpu.config import INDEX_DTYPE


class Gravity(NamedTuple):
    ax: jnp.ndarray
    ay: jnp.ndarray
    az: jnp.ndarray
    pot: jnp.ndarray  # per-particle potential (for egrav = 0.5 sum m*pot)


def direct_gravity(x, y, z, m, alive, G: float, eps: float = 0.0,
                   chunk: int = 2048) -> Gravity:
    N = x.shape[0]
    C = min(chunk, N)
    n_chunks = -(-N // C)
    Npad = n_chunks * C
    eps2 = eps * eps
    mj = jnp.where(alive, m, 0.0)

    def body(c):
        i_idx = jnp.minimum(c * C + jnp.arange(C, dtype=INDEX_DTYPE), N - 1)
        xi, yi, zi = x[i_idx], y[i_idx], z[i_idx]
        rx = xi[:, None] - x[None, :]
        ry = yi[:, None] - y[None, :]
        rz = zi[:, None] - z[None, :]
        not_self = jnp.arange(N, dtype=INDEX_DTYPE)[None, :] != i_idx[:, None]
        r2 = rx * rx + ry * ry + rz * rz + eps2
        inv_r = jax.lax.rsqrt(jnp.where(r2 > 0, r2, 1.0))
        inv_r = jnp.where((r2 > 0) & not_self, inv_r, 0.0)
        inv_r3 = inv_r * inv_r * inv_r
        w = mj[None, :] * inv_r3
        ax = -jnp.sum(w * rx, axis=1)
        ay = -jnp.sum(w * ry, axis=1)
        az = -jnp.sum(w * rz, axis=1)
        pot = -jnp.sum(mj[None, :] * inv_r, axis=1)
        return ax, ay, az, pot

    ax, ay, az, pot = jax.lax.map(body, jnp.arange(n_chunks, dtype=INDEX_DTYPE))
    out = [v.reshape(Npad)[:N] * G for v in (ax, ay, az, pot)]
    return Gravity(*out)


def egrav(m, pot, alive):
    """Total gravitational energy from per-particle potentials."""
    return 0.5 * jnp.sum(jnp.where(alive, m * pot, 0.0))
