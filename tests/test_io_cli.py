"""I/O round-trip + CLI smoke (reference analog: main/test/mpi/hdf5.cpp
H5Part round-trip and arg-parser tests)."""

import os

import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.io.hdf5 import HDF5Reader, HDF5Writer, load_checkpoint, save_checkpoint


def test_hdf5_roundtrip(tmp_path):
    path = str(tmp_path / "ck.h5")
    cfg = SphConfig()
    state, box, cfg = init_sedov(8, cfg, dt0=3e-4)
    save_checkpoint(path, state, cfg, box)

    state2, box2, cfg2 = load_checkpoint(path, SphConfig())
    assert box2 == box
    assert cfg2.gamma == pytest.approx(cfg.gamma)
    assert float(state2.dt) == pytest.approx(float(state.dt))
    np.testing.assert_allclose(np.asarray(state2.p.x), np.asarray(state.p.x))
    np.testing.assert_allclose(np.asarray(state2.p.temp),
                               np.asarray(state.p.temp))
    np.testing.assert_allclose(np.asarray(state2.p.h), np.asarray(state.p.h))


def test_writer_multiple_steps(tmp_path):
    path = str(tmp_path / "out.h5")
    cfg = SphConfig()
    state, box, cfg = init_sedov(6, cfg)
    w = HDF5Writer(path)
    w.write_step(state, cfg, box, fields={"rho": np.ones(6 ** 3)})
    w.write_step(state, cfg, box)
    w.close()
    r = HDF5Reader(path)
    assert r.num_steps() == 2
    f0, _ = r.read_step(0)
    assert "rho" in f0
    r.close()


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    from sphexa_tpu.main import main

    out = str(tmp_path / "d.h5")
    consts = str(tmp_path / "c.txt")
    main(["--init", "sedov", "-n", "10", "-s", "3", "--dt0", "2e-4",
          "-w", "2", "-o", out, "--constants", consts, "--quiet"])
    assert os.path.exists(out)
    lines = open(consts).read().strip().splitlines()
    assert len(lines) == 3
    cols = lines[-1].split()
    assert len(cols) == 9
    etot = float(cols[3])
    assert abs(etot - 1.0) < 1e-2


@pytest.mark.slow
def test_cli_restart(tmp_path):
    from sphexa_tpu.main import main

    out = str(tmp_path / "d.h5")
    main(["--init", "sedov", "-n", "10", "-s", "2", "--dt0", "2e-4",
          "-w", "2", "-o", out, "--constants", "", "--quiet"])
    state = main(["--init", out, "-s", "2", "--constants", "", "--quiet"])
    assert int(state.iteration) == 5  # 2 + 2 steps, 1-based


def test_split_restart(tmp_path):
    """Upsampled restart (FileSplitInit analog, file_init.hpp:103):
    N-fold particle count, conserved total mass, h scaled 1/cbrt(S),
    clones near their parents along the Hilbert curve, dt reduced."""
    from sphexa_tpu.io.hdf5 import load_split_checkpoint, save_checkpoint

    path = str(tmp_path / "ck.h5")
    cfg = SphConfig()
    state, box, cfg = init_sedov(8, cfg, dt0=3e-4)
    save_checkpoint(path, state, cfg, box)

    S = 4
    st2, box2, cfg2 = load_split_checkpoint(path, SphConfig(), S)
    alive = np.asarray(st2.p.alive)
    n0 = int(np.sum(np.asarray(state.p.alive)))
    assert int(alive.sum()) == S * n0
    m0 = float(np.sum(np.asarray(state.p.m)[np.asarray(state.p.alive)]))
    m2 = float(np.sum(np.asarray(st2.p.m)[alive]))
    assert m2 == pytest.approx(m0, rel=1e-5)
    h_ratio = (np.asarray(st2.p.h)[alive].mean()
               / np.asarray(state.p.h)[np.asarray(state.p.alive)].mean())
    assert h_ratio == pytest.approx(S ** (-1 / 3), rel=1e-4)
    assert float(st2.dt) == pytest.approx(float(state.dt) / (100 * S))
    # every original position survives exactly (clone j=0)
    x2 = np.asarray(st2.p.x)[alive]
    assert np.isin(np.asarray(state.p.x)[np.asarray(state.p.alive)][:10],
                   x2).all()
    # positions stay in the box
    assert x2.min() >= box.xmin and x2.max() <= box.xmax
