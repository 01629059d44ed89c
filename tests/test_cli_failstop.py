"""Main-loop fail-stop semantics (reference: capacity overflow throws,
xmass_gpu.cu:120-128; here the loop discards the truncated step,
re-grids/re-tiers, and retries — repeatedly, with a consecutive-failure
guard)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.medium
def test_cli_regrids_and_retries_on_overflow():
    """n=12 Sedov overflows the default gather caps (max_nc 170 >
    ngpad 160); the loop must re-grid, RETRY the discarded iteration,
    and finish all requested steps (pre-fix behavior: one-shot re-grid
    kept the truncated state and a second overflow aborted)."""
    env = dict(os.environ, SPHEXA_PLATFORM="cpu")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-m", "sphexa_tpu.main", "--init", "sedov",
         "-n", "12", "-s", "3"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    out = r.stdout + r.stderr
    assert "re-gridded with larger caps" in out
    # all 3 accepted iterations ran after the retry
    assert "### Check ### iter 3" in out
    # the discarded first attempt must not have advanced the counter
    # past the retry (iter numbering restarts at 1)
    assert "### Check ### iter 1" in out
