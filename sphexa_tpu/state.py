"""Particle state containers (SoA pytrees).

TPU-native analog of the reference's ParticlesData SoA field registry
(reference: sph/include/sph/particles_data.hpp:201-251). Conserved fields
live in the `Particles` pytree and persist across steps; dependent fields
(rho, p, cij, ...) are recomputed inside the force step and never stored.
Capacity is static; `alive` masks padding rows.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from sphexa_tpu.config import COORD_DTYPE, HYDRO_DTYPE


@struct.dataclass
class Particles:
    """Conserved per-particle fields (reference: ve_hydro.hpp:74 —
    x,y,z,h,m + temp, vx,vy,vz, x_m1,y_m1,z_m1, du_m1, alpha)."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    x_m1: jnp.ndarray   # x_n - x_{n-1}
    y_m1: jnp.ndarray
    z_m1: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    temp: jnp.ndarray
    h: jnp.ndarray
    m: jnp.ndarray
    alpha: jnp.ndarray
    du_m1: jnp.ndarray
    alive: jnp.ndarray  # bool mask for padding rows

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def permute(self, perm):
        """Reorder all per-particle arrays (after an SFC/cell sort)."""
        return Particles(**{k: getattr(self, k)[perm] for k in _FIELDS})


_FIELDS = ["x", "y", "z", "x_m1", "y_m1", "z_m1", "vx", "vy", "vz",
           "temp", "h", "m", "alpha", "du_m1", "alive"]


@struct.dataclass
class SimState:
    p: Particles
    ttot: jnp.ndarray      # total simulation time
    dt: jnp.ndarray        # current step dt (minDt)
    dt_m1: jnp.ndarray     # previous step dt
    iteration: jnp.ndarray


def make_particles(n_capacity: int, n_active: int | None = None, **fields) -> Particles:
    """Build a Particles pytree, zero-padding to capacity."""
    n_active = n_active if n_active is not None else n_capacity
    out = {}
    for name in _FIELDS[:-1]:
        dtype = COORD_DTYPE if name in ("x", "y", "z") else HYDRO_DTYPE
        arr = fields.get(name)
        if arr is None:
            arr = jnp.zeros((n_active,), dtype)
        else:
            arr = jnp.asarray(arr, dtype)
        if arr.shape[0] < n_capacity:
            pad = jnp.zeros((n_capacity - arr.shape[0],), dtype)
            arr = jnp.concatenate([arr, pad])
        out[name] = arr
    alive = jnp.arange(n_capacity) < n_active
    return Particles(alive=alive, **out)


def make_state(p: Particles, dt0: float = 1e-6, ttot: float = 0.0) -> SimState:
    f32 = jnp.float32
    return SimState(p=p, ttot=f32(ttot), dt=f32(dt0), dt_m1=f32(dt0),
                    iteration=jnp.int32(1))
