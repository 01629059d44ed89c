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
    lines = [ln for ln in open(consts).read().strip().splitlines()
             if not ln.startswith("#")]   # skip the observables header
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


def test_ascii_roundtrip_and_restart(tmp_path):
    """ASCII writer -> reader -> CLI restart (reference:
    io/ifile_io_ascii.cpp both directions)."""
    from sphexa_tpu.io.ascii import AsciiReader, AsciiWriter, \
        load_ascii_checkpoint

    cfg = SphConfig()
    state, box, cfg = init_sedov(6, cfg, dt0=1e-4)
    path = str(tmp_path / "dump.txt")
    w = AsciiWriter(path)
    w.write_step(state, cfg, box)
    w.write_step(state.replace(iteration=state.iteration + 1), cfg, box)

    r = AsciiReader(path)
    assert r.num_steps() == 2
    fields, attrs = r.read_step(-1)
    assert attrs["iteration"] == int(state.iteration) + 1
    np.testing.assert_allclose(fields["x"],
                               np.asarray(state.p.x)[np.asarray(state.p.alive)],
                               rtol=1e-6)

    st2, box2 = load_ascii_checkpoint(path, cfg, dt0=1e-4)
    assert box2 == box
    np.testing.assert_allclose(np.asarray(st2.p.temp),
                               fields["temp"], rtol=1e-6)

    # CLI restart from the ASCII dump
    from sphexa_tpu.main import main
    main(["--init", path, "-s", "1", "--dt0", "1e-6", "--quiet",
          "--constants", str(tmp_path / "c.txt")])


def test_output_triggers_time_and_wextra(tmp_path):
    """Float -w = sim-time-interval outputs; --wextra fires at given
    steps/times (reference: isOutputTime/isExtraOutputStep,
    sphexa.cpp:159-162)."""
    from sphexa_tpu.io.hdf5 import HDF5Reader
    from sphexa_tpu.main import main

    out = str(tmp_path / "o.h5")
    # dt0=1e-4 with growth cap 1.1: 5 steps cover ~6.1e-4 of sim time;
    # a 2e-4 interval must trigger >= 2 time-based outputs
    main(["--init", "sedov", "-n", "6", "-s", "5", "--dt0", "1e-4",
          "-w", "0.0002", "-o", out, "--quiet",
          "--constants", str(tmp_path / "c1.txt")])
    r = HDF5Reader(out)
    assert 2 <= r.num_steps() <= 4
    r.close()

    out2 = str(tmp_path / "o2.h5")
    main(["--init", "sedov", "-n", "6", "-s", "4", "--dt0", "1e-4",
          "--wextra", "2,3", "-o", out2, "--quiet",
          "--constants", str(tmp_path / "c2.txt")])
    r = HDF5Reader(out2)
    assert r.num_steps() == 2
    r.close()


def test_wall_clock_stop(tmp_path):
    """--duration 0 stops after the first iteration (reference:
    sphexa.cpp:156 isWallClockReached)."""
    from sphexa_tpu.main import main

    st = main(["--init", "sedov", "-n", "6", "-s", "50", "--dt0", "1e-5",
               "--duration", "0", "--quiet",
               "--constants", str(tmp_path / "c.txt")])
    assert int(st.iteration) <= 3


def test_debug_nans_flag(tmp_path):
    """--debug-nans (the -fsanitize CI analog) must not fire on a
    healthy run."""
    import jax

    from sphexa_tpu.main import main

    try:
        main(["--init", "sedov", "-n", "6", "-s", "2", "--dt0", "1e-5",
              "--debug-nans", "--quiet",
              "--constants", str(tmp_path / "c.txt")])
    finally:
        jax.config.update("jax_debug_nans", False)


def test_ascii_restart_preserves_velocity(tmp_path):
    """Press-2 carries v in the displacement history: the ASCII restart
    must reconstruct x_m1 = v dt (add_m1.py analog) or velocities would
    silently zero on the first step."""
    import jax.numpy as jnp

    from sphexa_tpu.io.ascii import AsciiWriter, load_ascii_checkpoint
    from sphexa_tpu.neighbors import CellGrid, choose_level
    from sphexa_tpu.propagator.ve import make_ve_step

    cfg = SphConfig()
    state, box, cfg = init_sedov(6, cfg, dt0=1e-4)
    # give particles a visible bulk velocity
    ps = state.p.replace(vx=jnp.full_like(state.p.vx, 0.3),
                         x_m1=jnp.full_like(state.p.x_m1, 0.3 * 1e-4))
    state = state.replace(p=ps)
    path = str(tmp_path / "d.txt")
    AsciiWriter(path).write_step(state, cfg, box)

    st2, box2 = load_ascii_checkpoint(path, cfg, dt0=1e-4)
    step = make_ve_step(box2, CellGrid(choose_level(
        box2, float(np.asarray(st2.p.h).max()) * 1.3)), cfg)
    st3, _ = step(st2)
    vx = np.asarray(st3.p.vx)[np.asarray(st3.p.alive)]
    assert abs(np.median(vx) - 0.3) < 0.05, np.median(vx)
