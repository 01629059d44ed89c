"""Turbulence stirring (reference analog: sph/test/hydro_turb/ — OU RNG
statistics and mode creation)."""

import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.physics.turbulence import (TurbulenceData,
                                           create_stirring_modes,
                                           stir_accelerations)


def test_mode_creation():
    L = 1.0
    twopi = 2 * np.pi
    modes, amps = create_stirring_modes(L, 0.999 * twopi, 3.001 * twopi, 1)
    assert len(modes) > 50
    k = np.linalg.norm(modes, axis=1)
    assert (k >= 0.99 * twopi).all() and (k <= 3.01 * twopi).all()
    assert (amps > 0).all()
    # 4-fold sign multiplicity keeps |amplitudes| balanced in ky, kz
    assert abs(modes[:, 1].sum()) < 1e-9
    assert abs(modes[:, 2].sum()) < 1e-9


def test_ou_statistics():
    """Stationary RMS of the OU sequence equals the variance parameter
    (reference: driver.hpp:44-80)."""
    td = TurbulenceData.create()
    dt = 0.05 * td.decay_time
    samples = []
    for i in range(2000):
        td.update_noise(dt)
        if i > 200:
            samples.append(td.phases.ravel().copy())
    rms = np.sqrt(np.mean(np.concatenate(samples) ** 2))
    np.testing.assert_allclose(rms, td.variance, rtol=0.05)


def test_projection_solenoidal():
    """With solWeight = 1, projected phases must be divergence-free:
    k . Re(phase) = 0 and k . Im(phase) = 0 per mode."""
    td = TurbulenceData.create(dict(solWeight=1.0))
    td.update_noise(0.01)
    re, im = td.projected_phases()
    kdot_re = np.abs(np.sum(td.modes * re, axis=1))
    kdot_im = np.abs(np.sum(td.modes * im, axis=1))
    scale = np.abs(re).max() * np.linalg.norm(td.modes, axis=1).max()
    assert kdot_re.max() / scale < 1e-5
    assert kdot_im.max() / scale < 1e-5


def test_stirring_checkpoint_roundtrip():
    td = TurbulenceData.create()
    td.update_noise(0.01)
    ck = td.checkpoint_state()
    td.update_noise(0.01)
    after_one = td.phases.copy()
    td.restore(ck)
    td.update_noise(0.01)
    np.testing.assert_array_equal(td.phases, after_one)


@pytest.mark.slow
def test_turb_ve_propagator_drives_motion():
    import jax.numpy as jnp
    from sphexa_tpu.init.turbulence import init_turbulence
    from sphexa_tpu.neighbors import CellGrid, choose_level
    from sphexa_tpu.propagator.turb_ve import TurbVeProp

    cfg = SphConfig(chunk=1024, cell_cap=256, ngpad=256)
    state, box, cfg = init_turbulence(12, cfg)
    grid = CellGrid(choose_level(box, float(state.p.h[0]) * 1.3))
    prop = TurbVeProp(box, grid, cfg)

    for _ in range(5):
        state, diag = prop(state)

    assert np.isfinite(float(diag.etot))
    # stirring injects kinetic energy from rest
    assert float(diag.ecin) > 0
    vrms = float(jnp.sqrt(jnp.mean(state.p.vx ** 2 + state.p.vy ** 2
                                   + state.p.vz ** 2)))
    assert vrms > 0
