"""SPH-EXA-TPU: a TPU-native smoothed-particle-hydrodynamics framework.

A from-scratch re-design of the capabilities of SPH-EXA (C++/MPI/CUDA) for
TPUs using JAX/XLA/Pallas:

- fixed-shape, SFC-sorted particle arrays instead of dynamic octrees
- uniform cell-list neighbor search producing padded fixed-k neighbor lists,
  built once per step and reused by every SPH pair stage
- fp32 compute with compensated (Kahan) summation for conservation-grade
  reductions (the reference uses fp64 coordinates)
- multi-chip scaling via jax.sharding meshes and XLA collectives
  (psum / ppermute halo bands) instead of MPI point-to-point
"""

__version__ = "0.1.0"

from sphexa_tpu.config import SphConfig
from sphexa_tpu.sfc.box import Box, Boundary
