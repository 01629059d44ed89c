"""Smoothing-kernel definitions, normalization, and lookup tables.

Physics follows the reference definitions
(reference: sph/include/sph/kernels.hpp:34-84 — sinc kernel, AV pair
viscosity, h-update controller; sph/include/sph/sph_kernel_tables.hpp —
3D normalization by Simpson quadrature; sph/include/sph/table_lookup.hpp
— 20000-entry linear-interpolation table on [0, 2]).

TPU note: the default evaluation path is the *analytic* sinc^n kernel
(sin + multiply chain on the VPU) rather than a table gather — random
gathers are slow on TPU while transcendentals are cheap. The table path
is kept for parity experiments (SphConfig.use_kernel_table).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

SUPPORT = 2.0  # kernel support in units of h


# --------------------------------------------------------------------------
# host-side (float64 numpy) kernel definition and normalization
# --------------------------------------------------------------------------

def wharmonic_np(v):
    """sinc(pi/2 * v), float64 numpy (host)."""
    v = np.asarray(v, dtype=np.float64)
    pv = (np.pi / 2.0) * v
    with np.errstate(invalid="ignore", divide="ignore"):
        w = np.where(v == 0.0, 1.0, np.sin(pv) / pv)
    return w


def wharmonic_derivative_np(v):
    """d/dv sinc(pi/2 * v), float64 numpy (host)."""
    v = np.asarray(v, dtype=np.float64)
    pv = (np.pi / 2.0) * v
    with np.errstate(invalid="ignore", divide="ignore"):
        sinc = np.where(v == 0.0, 1.0, np.sin(pv) / pv)
        d = sinc * (np.pi / 2.0) * (np.cos(pv) / np.sin(pv) - 1.0 / pv)
    return np.where(v == 0.0, 0.0, d)


def simpson(a: float, b: float, n: int, func) -> float:
    """Simpson quadrature with sorted-summand accumulation for accuracy
    (same integration scheme the reference uses to normalize kernels,
    sph_kernel_tables.hpp:28-56)."""
    h = (b - a) / n
    xs = a + h * np.arange(1, n)
    samples = func(xs)
    odd = np.sort(samples[0::2])     # x_1, x_3, ... (odd indices)
    even = np.sort(samples[1::2])    # x_2, x_4, ...
    return h / 3.0 * (func(np.array([a]))[0] + func(np.array([b]))[0]
                      + 4.0 * odd.sum() + 2.0 * even.sum())


@functools.lru_cache(maxsize=None)
def kernel_3d_k(sinc_index: float, support: float = SUPPORT) -> float:
    """3D normalization constant 1 / int_0^s 4 pi x^2 W(x) dx."""
    def vol(x):
        return 4.0 * np.pi * x * x * wharmonic_np(x) ** sinc_index
    return 1.0 / simpson(0.0, support, 2000, vol)


@functools.lru_cache(maxsize=None)
def make_tables(sinc_index: float, table_size: int = 20000):
    """Tabulate W(v) = sinc(pi v/2)^n and dW/dv at table_size points on
    [0, support]; returns float32 numpy arrays."""
    v = np.linspace(0.0, SUPPORT, table_size)
    w = wharmonic_np(v) ** sinc_index
    wd = sinc_index * wharmonic_np(v) ** (sinc_index - 1.0) * wharmonic_derivative_np(v)
    return w.astype(np.float32), wd.astype(np.float32)


# --------------------------------------------------------------------------
# device-side evaluation
# --------------------------------------------------------------------------

def _pow_int(x, n: int):
    """x**n by binary multiplication for small integer n."""
    result = None
    base = x
    while n > 0:
        if n & 1:
            result = base if result is None else result * base
        base = base * base
        n >>= 1
    return result


# Degree-6 polynomials in v^2 for sinc(pi v/2) and (d sinc/dv)/v on
# [0, 2]: max error ~2e-9 (below fp32 resolution). On TPU a polynomial
# (7 madds) is much cheaper than the transcendental closed form —
# measured 1.6x on the full Pallas step.
_SINC_COEF = (0.9999999994767121, -0.4112335029385433, 0.05073384282987128,
              -0.002980403757215835, 0.00010206937256680724,
              -2.263662159341907e-06, 3.090834479517968e-08)
_DSINC_OVER_V_COEF = (-0.8224670332327884, 0.2029356039981833,
                      -0.017882974714120713, 0.0008171065849809642,
                      -2.2900667062091163e-05, 4.308552351132641e-07,
                      -5.184117393639658e-09)


def _poly_even(v2, coef):
    acc = coef[-1]
    for c in reversed(coef[:-1]):
        acc = acc * v2 + c
    return acc


def exp_pair(x):
    """(e^x, e^-x) for |x| <= ~0.6 via even/odd degree-6 Taylor split
    (rel. error < 6e-6 at 0.6, < 1e-7 at 0.45): both exponentials for
    one short polynomial — used by the equal-mass Atwood ramp fast path
    of the momentum stage (XLA and Pallas formulations must match)."""
    x2 = x * x
    even = 1.0 + x2 * (0.5 + x2 * (1.0 / 24.0 + x2 * (1.0 / 720.0)))
    odd = x * (1.0 + x2 * (1.0 / 6.0 + x2 * (1.0 / 120.0)))
    return even + odd, even - odd


def w_sinc(v, sinc_index: float = 6.0):
    """W(v) = sinc(pi/2 v)^n on device; zero outside the support."""
    n_int = int(sinc_index)
    if float(n_int) == float(sinc_index) and 1 <= n_int <= 16:
        sinc = _poly_even(v * v, _SINC_COEF)
        w = _pow_int(sinc, n_int)
    else:
        pv = (jnp.pi / 2.0) * v
        safe = jnp.where(v > 1e-12, pv, 1.0)
        sinc = jnp.where(v > 1e-12, jnp.sin(safe) / safe, 1.0)
        w = jnp.power(jnp.maximum(sinc, 0.0), sinc_index)
    return jnp.where(v < SUPPORT, w, 0.0)


def w_sinc_derivative(v, sinc_index: float = 6.0):
    """dW/dv on device (polynomial evaluation; the closed form
    sinc*(pi/2)*(cot(pv) - 1/pv) cancels catastrophically in fp32 at
    small v, the fitted (dsinc/dv)/v polynomial is exact there)."""
    v2 = v * v
    sinc = _poly_even(v2, _SINC_COEF)
    dsinc = v * _poly_even(v2, _DSINC_OVER_V_COEF)
    n_int = int(sinc_index)
    if float(n_int) == float(sinc_index) and 2 <= n_int <= 16:
        wnm1 = _pow_int(sinc, n_int - 1)
    else:
        wnm1 = jnp.power(jnp.maximum(sinc, 0.0), sinc_index - 1.0)
    d = sinc_index * wnm1 * dsinc
    return jnp.where(v < SUPPORT, d, 0.0)


def table_lookup(table, v):
    """Linear-interpolation lookup, same semantics as the reference
    lt::lookup (table_lookup.hpp:14-26): zero at or beyond the support."""
    table = jnp.asarray(table)
    num_intervals = table.shape[0] - 1
    inv_dx = num_intervals / SUPPORT
    idxf = v * inv_dx
    idx = jnp.clip(idxf.astype(jnp.int32), 0, num_intervals - 1)
    lo = jnp.take(table, idx)
    hi = jnp.take(table, idx + 1)
    frac = idxf - idx.astype(v.dtype)
    out = lo + (hi - lo) * frac
    return jnp.where(idxf < num_intervals, out, 0.0)


# --------------------------------------------------------------------------
# scalar SPH helper physics
# --------------------------------------------------------------------------

def artificial_viscosity(alpha_i, alpha_j, c_i, c_j, w_ij):
    """Pair AV from alpha-weighted signal velocity, beta = 2
    (reference: kernels.hpp:71-84)."""
    beta = 2.0
    vij_signal = (alpha_i + alpha_j) / 4.0 * (c_i + c_j) - beta * w_ij
    return jnp.where(w_ij < 0.0, -vij_signal * w_ij, 0.0)


def update_h(ng0: int, nc, h, h_cap: float = 0.0):
    """nc -> h controller: h * 0.5 * (1 + 1023 * ng0/nc)^(1/10)
    (reference: kernels.hpp:27-32). Fixed point at nc == ng0.

    h_cap > 0 bounds the controller from above (rarefied-region clamp;
    see SphConfig.h_cap) — clamped particles ride with nc < ng0."""
    c0 = 1023.0
    nc_safe = jnp.maximum(nc.astype(h.dtype), 1.0)
    h_new = h * 0.5 * jnp.power(1.0 + c0 * ng0 / nc_safe, 0.1)
    if h_cap > 0.0:
        h_new = jnp.minimum(h_new, h.dtype.type(h_cap))
    return h_new


def ts_k_courant(maxvsignal, h, c, kcour: float):
    """Courant dt from the signal velocity (reference: kernels.hpp:11-16)."""
    v = jnp.where(maxvsignal > 0.0, maxvsignal, c)
    return kcour * h / v
