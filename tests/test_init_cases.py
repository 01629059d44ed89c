"""Every named test case must initialize and run a few stable VE/std
steps (reference analog: the init/*.hpp cases exercised by CI runs)."""

import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.factory import available_cases, make_initializer
from sphexa_tpu.neighbors import CellGrid, choose_level
from sphexa_tpu.propagator.ve import make_ve_step
from sphexa_tpu.propagator.std import make_std_step


def test_factory_lists_cases():
    cases = available_cases()
    for want in ["sedov", "noh", "isobaric-cube", "gresho-chan",
                 "kelvin-helmholtz", "wind-shock", "evrard"]:
        assert want in cases, cases


@pytest.mark.slow
@pytest.mark.parametrize("name,side", [
    ("sedov", 12), ("noh", 12), ("isobaric-cube", 10),
    ("gresho-chan", 12), ("kelvin-helmholtz", 24), ("wind-shock", 12),
])
def test_case_runs_stable(name, side):
    cfg = SphConfig(chunk=1024, cell_cap=256, ngpad=256)
    init = make_initializer(name)
    state, box, cfg = init(side, cfg)
    cfg = cfg.replace(gravG=0.0)  # hydro-only in this smoke test
    h_max = float(np.max(np.asarray(state.p.h)[np.asarray(state.p.alive)]))
    grid = CellGrid(choose_level(box, h_max * 1.3))
    step = make_ve_step(box, grid, cfg)

    for _ in range(5):
        state, diag = step(state)

    assert np.isfinite(float(diag.etot))
    assert float(diag.dt) > 0
    assert np.isfinite(np.asarray(state.p.x)).all()
    nc = float(diag.nc_mean)
    assert 20 < nc < 400, nc


@pytest.mark.slow
def test_std_propagator_sedov():
    cfg = SphConfig(chunk=1024, cell_cap=256, ngpad=256)
    init = make_initializer("sedov")
    state, box, cfg = init(12, cfg, dt0=2e-4)
    grid = CellGrid(choose_level(box, float(state.p.h[0]) * 1.3))
    step = make_std_step(box, grid, cfg)
    e0 = None
    for _ in range(10):
        state, diag = step(state)
        if e0 is None:
            e0 = float(diag.etot)
    assert np.isfinite(float(diag.etot))
    assert abs(float(diag.etot) - e0) / e0 < 5e-3
    assert float(diag.ecin) > 0


@pytest.mark.slow
def test_glass_relaxation_reduces_density_noise():
    """The glass tool (reference analog: the relaxed template block that
    assembleCuboid tiles, grid.hpp:238) must measurably suppress the
    density scatter of the jittered lattice it starts from."""
    import numpy as np

    from sphexa_tpu.init.glass import density_noise, relax_glass_block
    from sphexa_tpu.init.lattice import jittered_lattice

    side = 8
    xj, yj, zj = jittered_lattice(side, jitter=0.35, seed=42)
    noise_jit = density_noise(xj, yj, zj)
    xg, yg, zg = relax_glass_block(side, steps=40, seed=42, cache=False)
    noise_glass = density_noise(xg, yg, zg)
    assert len(xg) == side ** 3
    assert np.isfinite([xg, yg, zg]).all()
    assert ((xg >= 0) & (xg < 1)).all()
    # relaxation must clearly suppress the scatter and reach the
    # intrinsic glass level (~4% kNN-density noise)
    assert noise_glass < 0.62 * noise_jit, (noise_glass, noise_jit)
    assert noise_glass < 0.05, noise_glass


def test_glass_cuboid_tiling():
    """assembleCuboid analog: tiled glass fills a cuboid at the target
    spacing with near-uniform density; geometries that would squeeze
    the template anisotropically are rejected (callers fall back to a
    lattice — reference: main/src/init/grid.hpp:238)."""
    import pytest as _pytest

    from sphexa_tpu.init.glass import density_noise, glass_cuboid

    spacing = 1.0 / 48
    x, y, z = glass_cuboid((0, 0, 0), (1, 1, 1), spacing,
                           template_side=24)
    n_target = 1.0 / spacing ** 3
    assert abs(x.size - n_target) / n_target < 0.15
    assert x.min() >= 0 and x.max() < 1.0

    # density uniformity of the tiled field (periodic unit box)
    noise = density_noise(x, y, z)
    assert noise < 0.08, noise

    # non-cubic regions tile too when every extent hosts whole blocks
    xw, yw, zw = glass_cuboid((0, 0, 0), (1, 0.5, 0.5), spacing,
                              template_side=24)
    assert abs(xw.size - 0.25 * n_target) / (0.25 * n_target) < 0.15
    assert yw.max() < 0.5

    # a z-extent far below one template block must be rejected
    with _pytest.raises(ValueError):
        glass_cuboid((0, 0, 0), (1, 1, 0.0625), spacing, template_side=24)


def test_glass_template_override(tmp_path):
    """--glass template file (reference sphexa.cpp:82): an external
    block is normalized and tiled by glass_cuboid."""
    import numpy as np

    from sphexa_tpu.init.glass import glass_cuboid, set_glass_template

    rng = np.random.default_rng(0)
    side = 6
    g = (np.arange(side) + 0.5) / side
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    jit = rng.uniform(-0.03, 0.03, size=(3,) + gx.shape)
    path = str(tmp_path / "glass.npz")
    np.savez(path, x=(gx + jit[0]).ravel(), y=(gy + jit[1]).ravel(),
             z=(gz + jit[2]).ravel())
    try:
        set_glass_template(path)
        x, y, z = glass_cuboid((0, 0, 0), (1.0, 1.0, 1.0), spacing=1 / 12)
        # 2x2x2 tiles of the 6^3 template
        assert len(x) == 8 * side ** 3
        assert 0.0 <= x.min() and x.max() < 1.0
    finally:
        set_glass_template(None)
