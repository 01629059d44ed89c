"""Turbulence-driven VE propagator
(reference: main/src/propagator/turb_ve.hpp:68-118 — VE forces, then
driveTurbulence adds stirring accelerations before integration).

The OU noise state lives on the host; the projected phases enter the
jitted step as traced arguments, so each step is one compiled call."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.neighbors import CellGrid
from sphexa_tpu.physics.turbulence import TurbulenceData, stir_accelerations
from sphexa_tpu.propagator.common import finish_step
from sphexa_tpu.propagator.ve import compute_forces_ve
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.state import SimState


class TurbVeProp:
    def __init__(self, box: Box, grid: CellGrid, cfg: SphConfig,
                 turb: TurbulenceData | None = None, verbose: bool = False):
        self.turb = turb or TurbulenceData.create(verbose=verbose)
        self.cfg = cfg
        modes = jnp.asarray(self.turb.modes, jnp.float32)
        amps = jnp.asarray(self.turb.amplitudes, jnp.float32)
        norm = self.turb.sol_weight_norm

        @jax.jit
        def _step(state: SimState, phases_real, phases_imag):
            ps, me, aux = compute_forces_ve(state.p, box, grid, cfg, state.dt)
            sax, say, saz = stir_accelerations(
                ps.x, ps.y, ps.z, modes, phases_real, phases_imag, amps, norm)
            return finish_step(state, ps, me.ax + sax, me.ay + say,
                               me.az + saz, me.du, me.maxvsignal, aux["c"],
                               aux["divv"], aux["nc_sph"], box, cfg,
                               max_nc=aux["max_nc"],
                               max_cell_count=aux["max_cell_count"])

        self._step = _step

    def __call__(self, state: SimState):
        self.turb.update_noise(float(state.dt))
        pr, pi = self.turb.projected_phases()
        return self._step(state, pr, pi)
