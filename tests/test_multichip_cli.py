"""Multi-chip from the CLI (reference: sphexa.cpp:66-194 runs under
mpiexec -np N; here --prop ve-hilbert / ve-pallas-sharded build the
mesh from jax.devices()). The suite's conftest provisions 8 virtual
CPU devices, mirroring the reference's integration_mpi tests."""

import numpy as np
import pytest

from sphexa_tpu.main import main


@pytest.mark.multichip
@pytest.mark.slow
@pytest.mark.medium
def test_cli_ve_hilbert_evrard(tmp_path):
    """Load-balanced Hilbert domain + self-gravity, driven end-to-end
    from the front end on 8 virtual devices."""
    state = main(["--init", "evrard", "-n", "10", "-s", "3",
                  "--prop", "ve-hilbert", "--quiet",
                  "--constants", str(tmp_path / "c.txt"),
                  "-o", str(tmp_path / "d.h5")])
    alive = np.asarray(state.p.alive)
    assert int(state.iteration) == 4  # initial state carries iteration 1
    assert np.isfinite(np.asarray(state.p.x)[alive]).all()
    # constants.txt observable lines written per step
    lines = (tmp_path / "c.txt").read_text().strip().splitlines()
    assert len(lines) == 4  # header + 3 steps


@pytest.mark.multichip
@pytest.mark.slow
def test_cli_turb_bdt_sharded(tmp_path):
    """The full production composition from the front end: domain
    decomposition x block time-steps x turbulence driving
    (TurbVeBdtProp under mpiexec). One CLI step = one rung cycle."""
    state = main(["--init", "turbulence", "-n", "10", "-s", "2",
                  "--prop", "turbulence-ve-bdt-sharded", "--quiet",
                  "-w", "1", "--constants", str(tmp_path / "c.txt"),
                  "-o", str(tmp_path / "d.h5")])
    alive = np.asarray(state.p.alive)
    assert int(alive.sum()) == 10 ** 3
    vx = np.asarray(state.p.vx)[alive]
    assert np.isfinite(vx).all()
    assert np.abs(vx).max() > 0.0  # stirring imparted momentum
    # the dump carries the OU/RNG state for restart (turbulence
    # checkpoint contract, turbulence_data.hpp:47)
    import h5py
    with h5py.File(tmp_path / "d.h5", "r") as f:
        last = sorted(f.keys())[-1]
        assert "turbulence_phases" in f[last]


@pytest.mark.multichip
@pytest.mark.slow
def test_cli_bdt_sharded_evrard_gravity(tmp_path):
    """ve-bdt-sharded with SELF-GRAVITY from the CLI (the adapter used
    to refuse gravG != 0; the substep now runs the hierarchical
    cross-rank FMM — ve_hydro_bdt.hpp:277-288)."""
    state = main(["--init", "evrard", "-n", "10", "-s", "1",
                  "--prop", "ve-bdt-sharded", "--quiet",
                  "--constants", str(tmp_path / "c.txt")])
    alive = np.asarray(state.p.alive)
    assert int(alive.sum()) == 552  # r<=1 sphere cut from the lattice
    vx = np.asarray(state.p.vx)[alive]
    assert np.isfinite(vx).all() and np.abs(vx).max() > 0.0
    # the constants line carries a finite NEGATIVE gravitational energy
    # (egrav = -0.6 GM^2/R at t=0 for the 1/r profile)
    row = (tmp_path / "c.txt").read_text().strip().splitlines()[-1].split()
    egrav = float(row[6])
    assert np.isfinite(egrav) and egrav < -0.1


@pytest.mark.multichip
@pytest.mark.slow
def test_cli_ve_pallas_sharded_sedov(tmp_path):
    """Pallas cell-major engine inside shard_map, from the front end
    (interpret mode on the virtual CPU devices)."""
    state = main(["--init", "sedov", "-n", "12", "-s", "2",
                  "--prop", "ve-pallas-sharded", "--quiet",
                  "--constants", str(tmp_path / "c.txt")])
    alive = np.asarray(state.p.alive)
    assert int(state.iteration) == 3  # initial state carries iteration 1
    assert int(alive.sum()) == 12 ** 3
    assert np.isfinite(np.asarray(state.p.temp)[alive]).all()


@pytest.mark.multichip
@pytest.mark.medium
def test_cli_ve_tiered_sharded_evrard(tmp_path):
    """Tiers x sharding from the front end: adaptive h-tier zoom grids
    (chosen by the audited (slack, theta) ladder, choose_tiers_auto)
    over the load-balanced Hilbert domain."""
    state = main(["--init", "evrard", "-n", "10", "-s", "2",
                  "--prop", "ve-tiered-sharded", "--quiet",
                  "--constants", str(tmp_path / "c.txt"),
                  "-o", str(tmp_path / "d.h5")])
    alive = np.asarray(state.p.alive)
    assert int(state.iteration) == 3  # initial state carries iteration 1
    assert int(alive.sum()) > 0      # evrard carves a sphere from the cube
    assert np.isfinite(np.asarray(state.p.x)[alive]).all()
    assert np.isfinite(np.asarray(state.p.temp)[alive]).all()


@pytest.mark.multichip
@pytest.mark.slow
@pytest.mark.medium
def test_cli_ve_pallas_tiles_sedov(tmp_path):
    """Balanced 2-D tile domain x Pallas engine from the front end on
    8 virtual devices (--prop ve-pallas-tiles, VERDICT r4 item 7)."""
    state = main(["--init", "sedov", "-n", "10", "-s", "2",
                  "--prop", "ve-pallas-tiles", "--quiet",
                  "--constants", str(tmp_path / "c.txt"),
                  "-o", str(tmp_path / "d.h5")])
    alive = np.asarray(state.p.alive)
    assert int(alive.sum()) == 10 ** 3
    assert np.isfinite(np.asarray(state.p.x)[alive]).all()
    lines = (tmp_path / "c.txt").read_text().strip().splitlines()
    assert len(lines) == 3  # header + 2 steps
