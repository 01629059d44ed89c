"""Settings-keyed observables selection + per-step constants.txt writer
(reference: main/src/observables/factory.hpp:48-66 and iobservables.hpp).

The reference picks ONE observable implementation per run from the init
settings: grav-waves if `observeGravWaves` is set, the wind-bubble
survival fraction for `wind-shock`, Mach RMS for `turbulence`, the KH
growth-rate projection for `kelvin-helmholtz`, and plain time/energy
otherwise. Every implementation also writes the conserved-quantity
columns. Here the same selection runs off the layered settings dict
(init/settings.py) with the case name as an implicit settings key, so
`--init turbulence` selects TurbMachObs exactly like the reference's
`settings.count("turbulence")` branch.
"""

from __future__ import annotations

import numpy as np

from sphexa_tpu.config import SphConfig
from sphexa_tpu.observables.conserved import (Conserved, conserved_quantities,
                                              format_constants_line)
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.sph.eos import ideal_gas_cv
from sphexa_tpu.state import SimState


class TimeEnergyObs:
    """Default: iteration, time, dt, energy budget, momenta
    (reference: observables/time_energies.hpp)."""

    name = "time-energy"
    extra_columns: tuple = ()

    def compute_extras(self, state: SimState, diag, cfg: SphConfig,
                       box: Box):
        return ()

    def line(self, state: SimState, diag, cfg: SphConfig, box: Box) -> str:
        q: Conserved = conserved_quantities(state.p, cfg,
                                            egrav=float(diag.egrav))
        base = format_constants_line(int(state.iteration) - 1,
                                     float(diag.ttot), float(diag.dt), q)
        extras = self.compute_extras(state, diag, cfg, box)
        if extras:
            base += " " + " ".join("%.9g" % float(v) for v in extras)
        return base

    def header(self) -> str:
        cols = ("# iteration time minDt etot ecin eint egrav linmom angmom "
                + " ".join(self.extra_columns)).rstrip()
        return cols


class TurbMachObs(TimeEnergyObs):
    """Adds the RMS Mach number column (reference:
    observables/factory.hpp `settings.count("turbulence")` ->
    TurbulenceMachRMS)."""

    name = "turbulence-mach"
    extra_columns = ("machRMS",)

    def compute_extras(self, state, diag, cfg, box):
        from sphexa_tpu.observables.case_observables import turbulence_mach_rms
        return (turbulence_mach_rms(state.p, cfg),)


class TimeEnergyGrowthObs(TimeEnergyObs):
    """Adds the KH mode-1 growth amplitude (reference:
    observables/time_energy_growth.hpp)."""

    name = "kh-growth"
    extra_columns = ("khGrowthRate",)

    def compute_extras(self, state, diag, cfg, box):
        from sphexa_tpu.observables.case_observables import \
            kelvin_helmholtz_growth_rate
        return (kelvin_helmholtz_growth_rate(state.p, cfg),)


class WindBubbleObs(TimeEnergyObs):
    """Adds the bubble surviving fraction (reference:
    observables/wind_bubble_fraction.hpp:43-56: survivors satisfy
    rho >= 0.64 rhoBubble AND temp <= 0.9 tempWind). Density is
    re-estimated with the standard SPH summation over a throwaway
    neighbor list (kx/xm are in-graph intermediates on the TPU paths,
    so the exact VE density is not persisted)."""

    name = "wind-bubble"
    extra_columns = ("bubbleFraction",)

    def __init__(self, rho_int: float, u_ext: float, r_sphere: float):
        self.rho_int = float(rho_int)
        self.temp_wind = None   # derived from u_ext at first use (needs cv)
        self.u_ext = float(u_ext)
        bubble_volume = 4.0 / 3.0 * np.pi * float(r_sphere) ** 3
        self.bubble_mass = bubble_volume * float(rho_int)

    def compute_extras(self, state, diag, cfg, box):
        from sphexa_tpu.neighbors import (CellGrid, build_cell_list,
                                          build_neighbor_list, choose_level)
        from sphexa_tpu.sph.hydro_std import compute_density

        ps = state.p
        h_max = float(np.max(np.asarray(ps.h)[np.asarray(ps.alive)]))
        grid = CellGrid(choose_level(box, h_max * 1.25))
        cl = build_cell_list(grid, box, ps.x, ps.y, ps.z, alive=ps.alive)
        ps = ps.permute(cl.perm)
        nl = build_neighbor_list(grid, box, cl, ps.x, ps.y, ps.z, ps.h, cfg,
                                 adapt_h=False, alive=ps.alive)
        rho = compute_density(box, ps.x, ps.y, ps.z, ps.h, ps.m, nl.idx,
                              nl.nc, cfg)
        cv = ideal_gas_cv(cfg.mui, cfg.gamma)
        temp_wind = self.u_ext / float(cv)
        alive = np.asarray(ps.alive)
        surv = (np.asarray(rho) >= 0.64 * self.rho_int) \
            & (np.asarray(ps.temp) <= 0.9 * temp_wind) & alive
        surviving_mass = float(np.sum(np.asarray(ps.m)[surv]))
        return (surviving_mass / self.bubble_mass,)


class GravWaveObs(TimeEnergyObs):
    """Adds the h+ / hx strain columns at the configured observation
    direction (reference: observables/gravitational_waves.hpp; selected
    by the `observeGravWaves` settings key). Accelerations are
    reconstructed exactly from the Press-2 integrator state:
    x_m1 = v dt - a dt^2 / 2  =>  a = 2 (v dt - x_m1) / dt^2."""

    name = "grav-waves"
    extra_columns = ("httplus", "httcross")

    def __init__(self, theta: float, phi: float):
        self.theta = float(theta)
        self.phi = float(phi)

    def compute_extras(self, state, diag, cfg, box):
        from sphexa_tpu.observables.grav_waves import (compute_htt,
                                                       d2_quadrupole)
        ps = state.p
        dt = float(diag.dt)
        inv = 2.0 / max(dt * dt, 1e-30)

        def accel(v, dx_prev):
            return (v * dt - dx_prev) * inv

        ax = accel(ps.vx, ps.x_m1)
        ay = accel(ps.vy, ps.y_m1)
        az = accel(ps.vz, ps.z_m1)
        d2q = d2_quadrupole(ps.x, ps.y, ps.z, ps.vx, ps.vy, ps.vz,
                            ax, ay, az, ps.m, ps.alive)
        return compute_htt(np.asarray(d2q), self.theta, self.phi)


def make_observables(case: str | None, settings: dict | None = None):
    """The reference's observablesFactory selection order
    (factory.hpp:48-66), with the case name folded into the settings
    keys (the reference writes the case name as a settings key in the
    checkpoint attributes)."""
    s = dict(settings or {})
    if case:
        s.setdefault(case, 1.0)
    if "observeGravWaves" in s:
        if "gravWaveTheta" not in s or "gravWavePhi" not in s:
            raise ValueError("need gravWaveTheta and gravWavePhi settings "
                             "for the grav-waves observable "
                             "(factory.hpp:50-54)")
        return GravWaveObs(s["gravWaveTheta"], s["gravWavePhi"])
    if "wind-shock" in s:
        from sphexa_tpu.init.wind_shock import wind_shock_constants
        const = wind_shock_constants()
        return WindBubbleObs(s.get("rhoInt", const["rhoInt"]),
                             s.get("uExt", const["uExt"]),
                             s.get("rSphere", const["rSphere"]))
    if "turbulence" in s:
        return TurbMachObs()
    if "kelvin-helmholtz" in s:
        return TimeEnergyGrowthObs()
    return TimeEnergyObs()
