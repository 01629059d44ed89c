"""Global coordinate bounding box with periodic / open / fixed boundaries.

TPU-native analog of the reference's cstone::Box
(reference: domain/include/cstone/sfc/box.hpp; PBC fold at :235-254,
putInBox at :210-230). The box is a static (hashable) dataclass so that
boundary-condition branches resolve at trace time — no data-dependent
control flow reaches XLA.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class Boundary(enum.Enum):
    open = 0
    periodic = 1
    fixed = 2


@dataclasses.dataclass(frozen=True)
class Box:
    xmin: float
    xmax: float
    ymin: float
    ymax: float
    zmin: float
    zmax: float
    bx: Boundary = Boundary.open
    by: Boundary = Boundary.open
    bz: Boundary = Boundary.open

    @staticmethod
    def cube(lo: float, hi: float, boundary: Boundary = Boundary.open) -> "Box":
        return Box(lo, hi, lo, hi, lo, hi, boundary, boundary, boundary)

    @property
    def lx(self) -> float:
        return self.xmax - self.xmin

    @property
    def ly(self) -> float:
        return self.ymax - self.ymin

    @property
    def lz(self) -> float:
        return self.zmax - self.zmin

    @property
    def mins(self):
        return (self.xmin, self.ymin, self.zmin)

    @property
    def lengths(self):
        return (self.lx, self.ly, self.lz)

    @property
    def periodic(self):
        return (self.bx == Boundary.periodic,
                self.by == Boundary.periodic,
                self.bz == Boundary.periodic)

    @property
    def any_fixed(self) -> bool:
        return Boundary.fixed in (self.bx, self.by, self.bz)

    def with_bounds(self, xmin, xmax, ymin, ymax, zmin, zmax) -> "Box":
        return dataclasses.replace(self, xmin=xmin, xmax=xmax, ymin=ymin,
                                   ymax=ymax, zmin=zmin, zmax=zmax)


def _fold(r, length, is_periodic: bool):
    """Minimum-image fold of a displacement component."""
    if not is_periodic:
        return r
    return r - length * jnp.round(r / length)


def apply_pbc(box: Box, rx, ry, rz):
    """Minimum-image convention for displacement vectors.

    Equivalent to the reference applyPBC (box.hpp:235) for interaction
    distances < L/2, but branch-free.
    """
    px, py, pz = box.periodic
    return (_fold(rx, box.lx, px), _fold(ry, box.ly, py), _fold(rz, box.lz, pz))


def distance_pbc(box: Box, x1, y1, z1, x2, y2, z2):
    rx, ry, rz = apply_pbc(box, x1 - x2, y1 - y2, z1 - z2)
    return jnp.sqrt(rx * rx + ry * ry + rz * rz)


def _wrap(x, lo, length, is_periodic: bool):
    if not is_periodic:
        return x
    return x - length * jnp.floor((x - lo) / length)


def put_in_box(box: Box, x, y, z):
    """Wrap coordinates back into the box along periodic dimensions
    (reference: box.hpp putInBox)."""
    px, py, pz = box.periodic
    return (_wrap(x, box.xmin, box.lx, px),
            _wrap(y, box.ymin, box.ly, py),
            _wrap(z, box.zmin, box.lz, pz))


def normalize_coords(box: Box, x, y, z):
    """Map coordinates to [0, 1)^3 for SFC key computation."""
    nx = (x - box.xmin) / box.lx
    ny = (y - box.ymin) / box.ly
    nz = (z - box.zmin) / box.lz
    eps = jnp.float32(1.0 - 1e-7)
    return (jnp.clip(nx, 0.0, eps), jnp.clip(ny, 0.0, eps), jnp.clip(nz, 0.0, eps))


def extend_to_coords(box: Box, x, y, z, pad_rel: float = 1e-6):
    """Grow a box (host-side) to include given device arrays along open
    dimensions. Analog of makeGlobalBox (box_mpi.hpp:84) for one process;
    the multi-device version psum-reduces first."""
    import numpy as np

    xmin, xmax = float(jnp.min(x)), float(jnp.max(x))
    ymin, ymax = float(jnp.min(y)), float(jnp.max(y))
    zmin, zmax = float(jnp.min(z)), float(jnp.max(z))

    def pad(lo, hi):
        d = (hi - lo) * pad_rel + np.finfo(np.float32).eps
        return lo - d, hi + d

    bx = pad(xmin, xmax) if box.bx == Boundary.open else (box.xmin, box.xmax)
    by = pad(ymin, ymax) if box.by == Boundary.open else (box.ymin, box.ymax)
    bz = pad(zmin, zmax) if box.bz == Boundary.open else (box.zmin, box.zmax)
    return box.with_bounds(bx[0], bx[1], by[0], by[1], bz[0], bz[1])
