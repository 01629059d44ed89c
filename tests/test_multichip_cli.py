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
