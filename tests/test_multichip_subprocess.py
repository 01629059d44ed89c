"""8-device Pallas + balanced-domain integration in an ISOLATED process
(the reference pins `mpiexec -np 12` integration tests,
domain/test/integration_mpi/CMakeLists.txt; a subprocess dodges the
in-suite XLA compile-cache OOM that forced r2 to drop 8-device params)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.multichip
@pytest.mark.slow
def test_dryrun_multichip_12dev_subprocess():
    """12 virtual devices — the reference's largest pinned rank count
    (mpiexec -np 12 for domain_nranks/focus_tree/exchange_domain,
    integration_mpi/CMakeLists.txt). Uneven 12-way slabs exercise the
    remainder-handling the 2^k meshes never do."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(12)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "pallas stages on 12 devices" in r.stdout
    assert "balanced Hilbert domain + gravity" in r.stdout


@pytest.mark.multichip
@pytest.mark.slow
def test_dryrun_multichip_8dev_subprocess():
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"))
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "pallas stages on 8 devices" in r.stdout
    assert "balanced Hilbert domain + gravity" in r.stdout
