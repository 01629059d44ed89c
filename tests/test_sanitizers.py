"""Sanitizer tier (reference analog: the clang -fsanitize CI builds,
SURVEY.md §5): run the production step under jax_debug_nans.

This is more than a smoke test — the engine's frame contract puts
finite fill values in every dead/ghost slot precisely so that no
masked-out lane ever computes a NaN that a `where` then hides
(0*Inf, 0/0 through folded tile accumulations cannot be masked after
the fact). jax_debug_nans re-checks every primitive's output, so a
green run certifies the no-NaN-intermediates invariant; the seeded
test certifies the sanitizer itself is live."""

import jax
import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.propagator.ve import make_ve_step


def _with_debug_nans(fn):
    jax.config.update("jax_debug_nans", True)
    try:
        return fn()
    finally:
        jax.config.update("jax_debug_nans", False)


def test_ve_step_clean_under_debug_nans():
    """Two VE steps on Sedov with NaN-checking on every primitive: the
    no-NaN-intermediates frame contract must hold."""
    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(10, cfg, dt0=2e-4)
    grid = CellGrid(choose_level(box, float(state.p.h[0]) * 1.4))
    step = make_ve_step(box, grid, cfg)

    def run():
        s = state
        for _ in range(2):
            s, d = step(s)
        return s, d

    s, d = _with_debug_nans(run)
    assert np.isfinite(float(d.etot))


def test_debug_nans_catches_seeded_nan():
    """The sanitizer must actually trip: a NaN seeded into the IC's
    positions aborts the step with FloatingPointError (the --debug-nans
    CLI flag routes here, main.py jax_debug_nans)."""
    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    state, box, cfg = init_sedov(10, cfg, dt0=2e-4)
    x = np.asarray(state.p.x).copy()
    x[7] = np.nan
    state = state.replace(p=state.p.replace(x=jax.numpy.asarray(x)))
    grid = CellGrid(choose_level(box, 0.07))
    step = make_ve_step(box, grid, cfg)

    with pytest.raises(FloatingPointError):
        _with_debug_nans(lambda: step(state))
