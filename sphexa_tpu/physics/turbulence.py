"""Turbulence stirring: Ornstein-Uhlenbeck-driven Fourier forcing.

Physics follows the reference hydro_turb subsystem:
  - mode construction with band/parabolic spectrum between stirMin and
    stirMax and the 4-fold sign multiplicity
    (reference: sph/include/sph/hydro_turb/create_modes.hpp:59-177)
  - OU phase evolution x' = f x + sigma sqrt(1-f^2) z
    (reference: hydro_turb/driver.hpp:44-80 updateNoise)
  - solenoidal/compressive projection of the phases
    (reference: hydro_turb/phases.hpp computePhases)
  - per-particle stirring acceleration as a dense [N, M] mode sum
    (reference: hydro_turb/stirring.hpp:42 stirParticle) — on TPU this
    is pure VPU trig work, batched over all particles at once

The OU state (phases + RNG) lives on the host (numpy) and is
checkpointable; the mode sum runs on device with phases as traced
inputs, so no recompilation per step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def turbulence_constants() -> dict:
    """(reference: main/src/init/turbulence_init.hpp TurbulenceConstants)"""
    return dict(solWeight=0.5, stMaxModes=100000, Lbox=1.0,
                stEnergyPrefac=5.0e-3, stMachVelocity=0.3, minDt=1e-4,
                epsilon=1e-15, rngSeed=251299, stSpectForm=1, mTotal=1.0,
                powerLawExp=5.0 / 3.0, anglesExp=2.0, gamma=1.001, mui=0.62,
                u0=1000.0, kcour=0.4, gravConstant=0.0, ng0=100, ngmax=150)


def create_stirring_modes(Lbox: float, stir_min: float, stir_max: float,
                          spect_form: int = 1):
    """Full-sampling band (0) / parabolic (1) spectrum mode set with the
    reference's 4-fold (ky, kz sign) multiplicity. Returns
    (modes [M,3], amplitudes [M])."""
    twopi = 2.0 * np.pi
    kc = stir_min if spect_form == 0 else 0.5 * (stir_min + stir_max)
    ikmax = int(stir_max * Lbox / twopi) + 1

    modes, amps = [], []
    parab_prefact = -4.0 / (stir_max - stir_min) ** 2
    for ikx in range(0, ikmax + 1):
        kx = twopi * ikx / Lbox
        for iky in range(0, ikmax + 1):
            ky = twopi * iky / Lbox
            for ikz in range(0, ikmax + 1):
                kz = twopi * ikz / Lbox
                k = np.sqrt(kx * kx + ky * ky + kz * kz)
                if not (stir_min <= k <= stir_max):
                    continue
                amplitude = 1.0
                if spect_form == 1:
                    amplitude = abs(parab_prefact * (k - kc) ** 2 + 1.0)
                amplitude = 2.0 * np.sqrt(amplitude) * (kc / k)  # ndim=3
                for sy, sz in ((1, 1), (-1, 1), (1, -1), (-1, -1)):
                    modes.append((kx, sy * ky, sz * kz))
                    amps.append(amplitude)
    return np.asarray(modes, np.float64), np.asarray(amps, np.float64)


@dataclasses.dataclass
class TurbulenceData:
    """Host-side stirring state (checkpointable; reference:
    hydro_turb/turbulence_data.hpp:47)."""
    modes: np.ndarray        # [M, 3]
    amplitudes: np.ndarray   # [M]
    phases: np.ndarray       # [M, 6] OU phases
    variance: float
    decay_time: float
    sol_weight: float
    sol_weight_norm: float
    rng: np.random.Generator

    @classmethod
    def create(cls, constants: dict | None = None, verbose: bool = False):
        c = dict(turbulence_constants(), **(constants or {}))
        twopi = 2.0 * np.pi
        Lbox = c["Lbox"]
        eps = c["epsilon"]
        velocity = c["stMachVelocity"]
        energy = c["stEnergyPrefac"] * velocity ** 3 / Lbox
        stir_min = (1.0 - eps) * twopi / Lbox
        stir_max = (3.0 + eps) * twopi / Lbox

        decay_time = Lbox / (2.0 * velocity)
        variance = np.sqrt(energy / decay_time)
        ndim = 3
        w = c["solWeight"]
        sol_norm = (np.sqrt(3.0) * np.sqrt(3.0 / ndim)
                    / np.sqrt(1.0 - 2.0 * w + ndim * w * w))

        modes, amps = create_stirring_modes(Lbox, stir_min, stir_max,
                                            int(c["stSpectForm"]))
        if verbose:
            print(f"turbulence: {len(modes)} stirring modes")
        rng = np.random.default_rng(int(c["rngSeed"]))
        return cls(modes=modes, amplitudes=amps,
                   phases=np.zeros((len(modes), 6)), variance=float(variance),
                   decay_time=float(decay_time), sol_weight=float(w),
                   sol_weight_norm=float(sol_norm), rng=rng)

    def update_noise(self, dt: float):
        """OU step (reference: driver.hpp updateNoise)."""
        damp_a = np.exp(-dt / self.decay_time)
        damp_b = np.sqrt(1.0 - damp_a * damp_a)
        z = self.rng.standard_normal(self.phases.shape)
        self.phases = self.phases * damp_a + self.variance * damp_b * z

    def projected_phases(self):
        """Solenoidal/compressive Helmholtz projection
        (reference: phases.hpp computePhases). Returns (real, imag) [M,3]."""
        k = self.modes                          # [M, 3]
        ou = self.phases                        # [M, 6]
        ou_re = ou[:, 0::2]                     # [M, 3]
        ou_im = ou[:, 1::2]
        kk = np.sum(k * k, axis=1, keepdims=True)
        ka = np.sum(k * ou_im, axis=1, keepdims=True)
        kb = np.sum(k * ou_re, axis=1, keepdims=True)
        diva = k * ka / kk
        divb = k * kb / kk
        curla = ou_re - divb
        curlb = ou_im - diva
        w = self.sol_weight
        real = w * curla + (1.0 - w) * divb
        imag = w * curlb + (1.0 - w) * diva
        return real.astype(np.float32), imag.astype(np.float32)

    def checkpoint_state(self) -> dict:
        return dict(phases=self.phases.copy(),
                    rng_state=self.rng.bit_generator.state)

    def restore(self, ck: dict):
        self.phases = ck["phases"].copy()
        self.rng.bit_generator.state = ck["rng_state"]


def stir_accelerations(x, y, z, modes, phases_real, phases_imag, amplitudes,
                       sol_weight_norm: float, chunk: int = 65536):
    """Dense per-particle stirring acceleration (device).

    a_i = solNorm * sum_m A_m * (Re_m * cos(k.x) - Im_m * sin(k.x))
    with per-component phase vectors (reference: stirring.hpp:42-78).
    """
    km = jnp.asarray(modes, jnp.float32)        # [M, 3]
    amp = jnp.asarray(amplitudes, jnp.float32)  # [M]
    pr = jnp.asarray(phases_real)               # [M, 3]
    pi = jnp.asarray(phases_imag)

    N = x.shape[0]
    C = min(chunk, N)
    n_chunks = -(-N // C)
    Npad = n_chunks * C

    def body(c):
        i = jnp.minimum(c * C + jnp.arange(C, dtype=jnp.int32), N - 1)
        # phase angle k . x : [C, M]
        ang = (x[i][:, None] * km[None, :, 0] + y[i][:, None] * km[None, :, 1]
               + z[i][:, None] * km[None, :, 2])
        cosa = jnp.cos(ang)
        sina = jnp.sin(ang)
        ax = jnp.sum(amp[None, :] * (pr[None, :, 0] * cosa - pi[None, :, 0] * sina), axis=1)
        ay = jnp.sum(amp[None, :] * (pr[None, :, 1] * cosa - pi[None, :, 1] * sina), axis=1)
        az = jnp.sum(amp[None, :] * (pr[None, :, 2] * cosa - pi[None, :, 2] * sina), axis=1)
        return ax, ay, az

    ax, ay, az = jax.lax.map(body, jnp.arange(n_chunks, dtype=jnp.int32))
    s = jnp.float32(sol_weight_norm)
    return (ax.reshape(Npad)[:N] * s, ay.reshape(Npad)[:N] * s,
            az.reshape(Npad)[:N] * s)
