"""Runtime constants and precision policy.

Mirrors the runtime-constant surface of the reference's ParticlesData
(reference: sph/include/sph/particles_data.hpp:86-138) as a static,
hashable config so it can close over jitted step functions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

# Precision policy (reference: sph/include/sph/types.hpp:39-46 uses
# double coordinates + float hydro; on TPU we use fp32 coordinates with
# compensated summation in the reductions that need it).
COORD_DTYPE = jnp.float32
HYDRO_DTYPE = jnp.float32
KEY_DTYPE = jnp.uint32
INDEX_DTYPE = jnp.int32


@dataclasses.dataclass(frozen=True)
class SphConfig:
    """Static SPH runtime constants (hashable; safe as a jit static arg).

    Defaults follow the reference defaults
    (sph/include/sph/particles_data.hpp:90-138).
    """

    # neighbor targets
    ng0: int = 100            # desired mean neighbor count
    ngmax: int = 150          # max neighbors before h is re-adjusted
    ngpad: int = 160          # padded neighbor-list width (static shape)

    # time-step control
    kcour: float = 0.2        # Courant fraction
    krho: float = 0.06        # 1/|divv| fraction
    max_dt_increase: float = 1.1
    eta_acc: float = 0.2      # acceleration-based dt control
    eps: float = 0.005        # gravitational smoothing

    # physics constants
    gamma: float = 5.0 / 3.0  # adiabatic index
    mui: float = 10.0         # mean molecular weight of ions
    gravG: float = 0.0        # gravitational constant (0 = hydro only)

    # artificial-viscosity switches
    alphamin: float = 0.05
    alphamax: float = 1.0
    decay_constant: float = 0.2

    # Atwood-number ramp for crossed/uncrossed VE momentum terms
    atmin: float = 0.1
    atmax: float = 0.2

    # smoothing kernel
    sinc_index: float = 6.0
    kernel_table_size: int = 20000
    use_kernel_table: bool = False   # False = evaluate sinc^n analytically

    # AV velocity-gradient cleaning terms in the momentum equation
    av_clean: bool = False

    # All particle masses equal (true for every lattice/glass test
    # case). Lets the momentum kernel's Atwood ramp run clamp-form with
    # a short polynomial exp pair instead of per-pair exp + divide —
    # exact under equal masses, where the xm contrast of any ramp-
    # interior pair is bounded by the Atwood window. Initializers set
    # it; checkpoint loaders clear it when masses vary.
    uniform_mass: bool = False

    # gravity solver: "direct" (N^2, exact) or "fmm" (dense level-
    # synchronous fast multipole, ~1e-2 rms force error like BH theta~1)
    gravity_solver: str = "direct"
    fmm_level: int = 4
    fmm_min_sep: int = 3      # FMM well-separateness class (the MAC
                              # theta analog): 2 = classic V-list
                              # (worst expansion ratio 0.87), 3 =
                              # tighter default (0.58, ~5x lower rms),
                              # 4 = tighter still at a wider near field

    # Pallas path: factor the IAD velocity-gradient and AV graddivv pair
    # reductions into cell-centered j-side moment matmuls on the MXU
    # (single pass per stage). With trustworthy device-trace timing
    # (round 2b) the direct VPU bodies measure FASTER on the v5e than
    # the hybrids (IAD 73 vs 79 ms, AV 60 vs 68 ms at Sedov 100^3 /
    # cap 64): Mosaic's fp32 dot decomposition plus the moment-column
    # assembly costs more than the saved reductions. Default is now
    # the direct bodies; the hybrids remain for MXU-richer hardware.
    mxu_moments: bool = False

    # Pallas path: factor ALL momentum-stage pair reductions (termA
    # projections, momentum, energy, viscous energy) into one stacked
    # [5*CAP, 3*CAP] x [3*CAP, 49] cell-centered moment contraction per
    # z-run on the MXU. Not compatible with av_clean (the rv correction
    # is a per-pair rational term) — av_clean falls back to the direct
    # body. Measured on the v5e at Sedov 100^3 / cap 64: 143 ms vs the
    # direct body's 138 ms under 128-aligned parity windows (the moment
    # column build + stacked dot costs slightly more than the saved VPU
    # reductions), so the default stays the direct body; the hybrid is
    # kept for future MXU-heavier geometries (it wins when windows are
    # misaligned: 148 vs 160 ms on 192-lane windows).
    mxu_momentum: bool = False
    # bf16 operands (fp32 accumulation) for the factored momentum-stage
    # MXU contraction: an fp32 dot on the MXU decomposes into 3-6 bf16
    # passes, so casting the pair-weight rows and moment columns to
    # bf16 cuts MXU work ~3x at ~3-digit operand precision. Decision
    # spike (VERDICT r4 item 4); accuracy impact measured by
    # scripts/bf16_spike.py before any default flips.
    mxu_bf16: bool = False
    gravity_rings: int = 1    # near-field band hops for the sharded FMM
                              # (fixed-width slabs need 1; count-balanced
                              # clustered domains may need 2-3 — the
                              # ring-violation counter fail-stops when
                              # insufficient)
    gravity_band_cap: int = 0  # boundary-band slots/rank for the generic
                               # sharded FMM (0 = cap, always complete);
                               # size from fmm.estimate_band_cap for the
                               # O(local + R*band) LET economy — the
                               # band-overflow counter fail-stops when
                               # too small

    # Bounded smoothing length (0 = unbounded). When > 0, the nc->h
    # controller (sph/kernels.py update_h AND the in-kernel h iteration
    # of the Pallas xmass stage) clamps h at this value. Standard
    # production-SPH practice for rarefied regions; on TPU it is the
    # lever that keeps the cell-major grid inside the proven cap-128
    # compile envelope when a low-density cavity (Sedov interior,
    # vacuum edges) grows h without bound — the reference instead
    # re-sizes its octree leaves per sync (csarray.hpp:433), which has
    # no static-shape analog. Clamped particles carry nc < ng0; the
    # engines report the clamp count in their diagnostics.
    h_cap: float = 0.0

    # Fraction of alive particles allowed to sit at a tier's h support
    # bound before the tiered engines fold the step (ve_tiered.py).
    # The vacuum-edge envelope of a collapsing cloud legitimately and
    # PREDICTABLY outgrows the top band (queue9/12 2026-08-20: every
    # Evrard-50 fold was pure clamp at ~2.6% of the alive set) — a
    # bounded clamp population is the h_cap semantics, not an error.
    # 0 restores the strict any-clamp-folds behavior.
    clamp_frac_budget: float = 0.03

    # neighbor-engine shape parameters (static!)
    cell_cap: int = 64        # max particles per search cell
    chunk: int = 4096         # i-particle chunk size for pair stages
    h_iter: int = 2           # coupled h/neighbor-count iterations
                              # (steady-state h is near-converged between
                              # steps; raise for cold-start transients)

    @property
    def ramp(self) -> float:
        return 1.0 / (self.atmax - self.atmin)

    def replace(self, **kw) -> "SphConfig":
        return dataclasses.replace(self, **kw)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
