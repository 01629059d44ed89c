"""Evrard collapse with radiative cooling + chemistry
(reference: main/src/init/evrard_init.hpp + the evrard-cooling case
wiring of init/factory.hpp and std_hydro_grackle.hpp).

Same 1/r gas sphere as the adiabatic Evrard case, but in CGS-scaled
units so the cooling table applies, with per-particle chemistry fields
initialized to the CIE equilibrium of the initial temperature."""

from __future__ import annotations

import numpy as np

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.evrard import init_evrard
from sphexa_tpu.physics.chemistry import ChemistryData, cie_equilibrium


def init_evrard_cooling(side: int, cfg: SphConfig,
                        capacity: int | None = None,
                        dt0: float | None = None):
    from sphexa_tpu.physics.cooling import CoolingParams

    state, box, cfg = init_evrard(side, cfg, capacity=capacity, dt0=dt0)
    # the hydro stays in Evrard code units (G = M = R = 1); the cooling
    # table speaks cgs — map via the code_units analog so the initial
    # gas sits at ~2e4 K and n_H ~ 0.05 cm^-3 (warm, partially ionized)
    temp_code0 = float(np.asarray(state.p.temp)[0])
    params = CoolingParams(temp_to_k=2.0e4 / max(temp_code0, 1e-30),
                           rho_to_cgs=1.0e-22)
    eq = cie_equilibrium(state.p.temp * params.temp_to_k)
    chem = ChemistryData(x_HI=eq.x_HI, x_HII=eq.x_HII, x_HeI=eq.x_HeI,
                         x_HeII=eq.x_HeII, x_HeIII=eq.x_HeIII, x_e=eq.x_e)
    return state, box, cfg, {"chem": chem, "cooling_params": params}
