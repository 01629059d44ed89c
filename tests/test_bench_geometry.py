"""Bench-path construction guards (the check whose absence shipped the
round-2 bench crash: CAP=96 with npz=26 has no legal z-supercell, so
make_cell_pair_call raised StopIteration at the first engine build).

Fast tier: the (npz, cap) legality algebra and the joint cap/grid scan
on synthetic positions. Slow tier: the real bench-sized IC for every
BASELINE.md case, through engine *construction* (host-side; no TPU)."""

import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.ops.cellmajor import (CMGrid, choose_cap_and_grid,
                                      choose_cm_grid, legal_zgroup,
                                      max_cell_count)
from sphexa_tpu.ops.pallas_ve import make_cell_pair_call


def test_legal_zgroup_algebra():
    # the exact round-2 failure: npz=26 (divisors 1,2,13) x cap=96
    # (needs z in {4,8}) has no legal group
    assert legal_zgroup(26, 96) == 0
    # cap%64==0 with even npz always legal via z=2 (or better)
    assert legal_zgroup(26, 64) == 2
    assert legal_zgroup(26, 128) == 2
    assert legal_zgroup(24, 128) == 8
    assert legal_zgroup(24, 96) == 8   # 8*96 = 6*128
    assert legal_zgroup(26, 32) == 0   # 32 needs z in {4,8,12,...}


def test_make_cell_pair_call_rejects_illegal_geometry():
    grid = CMGrid(n=24, cap=96)  # npz=26: the round-2 crash geometry
    with pytest.raises(ValueError, match="z-supercell"):
        make_cell_pair_call(grid, 5, 1, lambda c, r: None)


def _uniform_points(n_side, rng):
    pts = (np.indices((n_side,) * 3).reshape(3, -1).T + 0.5) / n_side
    pts += rng.uniform(-0.1 / n_side, 0.1 / n_side, pts.shape)
    return pts.T


def test_choose_cap_and_grid_fits_and_is_legal():
    from sphexa_tpu.sfc.box import Boundary, Box
    rng = np.random.default_rng(0)
    box = Box.cube(-0.5, 0.5, Boundary.periodic)
    xs, ys, zs = _uniform_points(40, rng) - 0.5
    h = 1.2 / 40
    cap, grid = choose_cap_and_grid(box, h * 1.2, 40 ** 3, xs, ys, zs)
    assert legal_zgroup(grid.npz, cap) > 0
    assert max_cell_count(grid, box, xs, ys, zs) <= cap
    # construction must succeed (this is what crashed in round 2)
    make_cell_pair_call(grid, 5, 1, lambda c, r: None)

    # clustered: all mass in one octant -> needs a deeper cap, still legal
    cap2, grid2 = choose_cap_and_grid(box, h * 1.2, 40 ** 3,
                                      xs * 0.5, ys * 0.5, zs * 0.5)
    assert legal_zgroup(grid2.npz, cap2) > 0
    assert cap2 > cap
    assert max_cell_count(grid2, box, xs * 0.5, ys * 0.5, zs * 0.5) <= cap2


@pytest.mark.slow
@pytest.mark.parametrize("case,side", [("sedov", 100), ("noh", 100),
                                       ("evrard", 50)])
def test_bench_case_constructs(case, side):
    """Every BASELINE.md bench config must reach engine construction
    with the bench's own cap/grid selection (init -> choose_cap_and_grid
    -> make_cell_pair_call), host-side."""
    cfg = SphConfig()
    if case == "noh":
        from sphexa_tpu.init.noh import init_noh
        state, box, cfg = init_noh(side, cfg, dt0=1e-5)
    elif case == "evrard":
        from sphexa_tpu.init.evrard import init_evrard
        state, box, cfg = init_evrard(side, cfg, dt0=1e-4)
    else:
        from sphexa_tpu.init.sedov import init_sedov
        state, box, cfg = init_sedov(side, cfg, dt0=1e-4)
    alive = np.asarray(state.p.alive)
    xs = np.asarray(state.p.x)[alive]
    ys = np.asarray(state.p.y)[alive]
    zs = np.asarray(state.p.z)[alive]
    h_max = float(np.max(np.asarray(state.p.h)[alive]))
    cap, grid = choose_cap_and_grid(box, h_max * 1.2, side ** 3, xs, ys, zs)
    assert max_cell_count(grid, box, xs, ys, zs) <= cap
    make_cell_pair_call(grid, 5, 1, lambda c, r: None)


def test_legal_zgroup_lane_budget():
    """Z*CAP is budgeted to 1024 lanes (the proven cap-128 x Z-8
    working set): the unbudgeted Z=8 pick at cap 320/384 built
    103-122 MiB scoped-VMEM stacks on the v5e (tpu_queue.log
    2026-08-19)."""
    assert legal_zgroup(16, 128) == 8      # 1024 exactly: the envelope
    assert legal_zgroup(16, 256) == 4      # budget halves Z
    assert legal_zgroup(16, 384) == 2      # 768 lanes
    assert legal_zgroup(16, 640) == 1      # cap alone under budget
    # cap itself over budget: smallest legal Z rather than refusal
    assert legal_zgroup(16, 1280) == 1


def test_cap_scan_rejects_half_vreg_centers():
    """Center slices must be 128-lane aligned: cap 192/320 (1.5 / 2.5
    vregs) blew Mosaic stacks at 114 / 103 MiB; the scan must step
    over them to the next k*128 cap (DESIGN.md 'Aligned-cap rule')."""
    import numpy as np

    from sphexa_tpu.sfc.box import Box

    box = Box(0, 1, 0, 1, 0, 1)
    rng = np.random.RandomState(0)
    n = 4096
    x, y, z = rng.rand(3, n).astype(np.float32)
    # force a tiny grid so the realized count lands between 129-192:
    # h_eff ~ 0.25 -> n_corr ~ 2 (8 cells, ~512/cell) ... scan caps
    cap, grid = choose_cap_and_grid(box, 0.22, n, x, y, z)
    assert cap == 64 or cap % 128 == 0, (cap, grid)
