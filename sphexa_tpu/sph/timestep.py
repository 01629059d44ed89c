"""Global time-step determination (reference: sph/include/sph/ts_global.hpp).

All reductions mask dead padding rows; the cross-device min happens in
the domain layer via psum/pmin when running sharded.
"""

from __future__ import annotations

import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.sph.kernels import ts_k_courant

BIG = jnp.float32(1e30)


def courant_timestep(maxvsignal, h, c, alive, kcour: float):
    dt_i = ts_k_courant(maxvsignal, h, c, kcour)
    return jnp.min(jnp.where(alive, dt_i, BIG))


def rho_timestep(divv, alive, krho: float):
    """Krho / |max divv| (reference: ts_global.hpp:70-94)."""
    max_divv = jnp.max(jnp.where(alive, divv, -BIG))
    return krho / jnp.maximum(jnp.abs(max_divv), 1e-30)


def acceleration_timestep(ax, ay, az, alive, eta_acc: float, eps: float):
    """etaAcc * sqrt(eps / |a|_max) (reference: ts_global.hpp:46-68)."""
    acc2 = ax * ax + ay * ay + az * az
    max_acc = jnp.sqrt(jnp.max(jnp.where(alive, acc2, 0.0)))
    return eta_acc * jnp.sqrt(eps / jnp.maximum(max_acc, 1e-30))


def combine_timesteps(dt_prev, dt_candidates, cfg: SphConfig):
    """min of all limits and maxDtIncrease * previous dt
    (reference: ts_global.hpp:96-112). Cross-device min is applied by the
    caller when sharded."""
    dt = jnp.minimum(cfg.max_dt_increase * dt_prev,
                     jnp.asarray(dt_candidates).min())
    return dt
