"""BDT x tiers (the last lever pairing; reference: the BDT propagator
always runs on the adaptive focused octree, ve_hydro_bdt.hpp).
num_rungs=1 must reproduce the plain tiered engine exactly (one
all-active substep == one tiered step); multi-rung runs must show a
real dt hierarchy with gated compute and clean fail-stops.

The plain-tiered reference trajectory is computed in a SUBPROCESS:
the jax-0.9.0 virtual-CPU backend mis-executes a second big-constant
program in the same process (docs/DESIGN.md "Known test-backend
pitfall"), so each compiled engine gets its own process.
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.evrard import init_evrard
from sphexa_tpu.propagator.ve_tiered import choose_tiers_auto
from sphexa_tpu.propagator.ve_tiered_bdt import TieredBdtVE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PLAIN_REF = """
import os
import sys

# force the CPU backend BEFORE any jax use: the parent env has no
# JAX_PLATFORMS (conftest pops it), and default plugin discovery would
# hang on a half-dead TPU tunnel (same rationale as main.py's
# SPHEXA_PLATFORM handling)
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.evrard import init_evrard
from sphexa_tpu.propagator.ve_tiered import (choose_tiers_auto,
                                             make_ve_step_pallas_tiered)

side, nsteps, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
cfg = SphConfig(chunk=512, cell_cap=512, ngpad=256, gravG=0.0)
state, box, cfg = init_evrard(side, cfg, dt0=1e-4)
cfg = cfg.replace(gravG=0.0)
p = state.p
alive = np.asarray(p.alive)
tiers = choose_tiers_auto(box, p.x, p.y, p.z, p.h, alive=alive,
                          cap_max=128)
step = make_ve_step_pallas_tiered(box, tiers, cfg, interpret=True)
for _ in range(nsteps):
    state, d = step(state)
assert int(d.max_cell_count) == 0
np.savez(out, x=np.asarray(state.p.x), y=np.asarray(state.p.y),
         z=np.asarray(state.p.z), h=np.asarray(state.p.h),
         alive=np.asarray(state.p.alive), dt=float(d.dt),
         eint=float(d.eint), ecin=float(d.ecin))
"""


def _evrard(side):
    cfg = SphConfig(chunk=512, cell_cap=512, ngpad=256, gravG=0.0)
    state, box, cfg = init_evrard(side, cfg, dt0=1e-4)
    return state, box, cfg.replace(gravG=0.0)


@pytest.mark.medium
def test_tiered_bdt_rung1_matches_plain():
    side, nsteps = 16, 2
    state, box, cfg = _evrard(side)
    p = state.p
    alive = np.asarray(p.alive)
    tiers = choose_tiers_auto(box, p.x, p.y, p.z, p.h, alive=alive,
                              cap_max=128)
    
    eng = TieredBdtVE(box, tiers, cfg, num_rungs=1, interpret=True)
    bst = eng.bind(state)
    for _ in range(nsteps):
        bst, ds = eng.run_cycle(bst)
    db = ds[-1]
    assert int(db.fold) == 0

    # plain-tiered reference in its own process (one compiled program
    # per process — the jax-0.9.0 CPU backend containment)
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "ref.npz")
        r = subprocess.run(
            [sys.executable, "-c", _PLAIN_REF, str(side), str(nsteps),
             out],
            cwd=REPO, env=dict(os.environ), capture_output=True,
            text=True, timeout=3600)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        ref = dict(np.load(out))

    np.testing.assert_allclose(float(db.dt), ref["dt"], rtol=1e-5)
    np.testing.assert_allclose(float(db.eint), ref["eint"], rtol=1e-5)
    # cold Evrard w/o gravity: net forces ~0, so ecin (~5e-9 vs eint
    # ~1) is pure fp32 pair-cancellation noise whose value depends on
    # summation order — compare at noise scale, the real parity signal
    # is dt/eint/x/h above
    np.testing.assert_allclose(float(db.ecin), ref["ecin"], rtol=0.5,
                               atol=1e-8)
    # the plain step cell-sorts its frame each step; match by position
    # (memory: never compare by index across engines)
    from scipy.spatial import cKDTree
    mine = np.stack([np.asarray(bst.p.x)[np.asarray(bst.p.alive)],
                     np.asarray(bst.p.y)[np.asarray(bst.p.alive)],
                     np.asarray(bst.p.z)[np.asarray(bst.p.alive)]], 1)
    ra = ref["alive"].astype(bool)
    theirs = np.stack([ref["x"][ra], ref["y"][ra], ref["z"][ra]], 1)
    assert mine.shape == theirs.shape
    dist, idx = cKDTree(theirs).query(mine)
    assert dist.max() < 5e-6, dist.max()
    np.testing.assert_allclose(
        np.asarray(bst.p.h)[np.asarray(bst.p.alive)], ref["h"][ra][idx],
        rtol=1e-5)


@pytest.mark.medium
def test_tiered_bdt_cli_subprocess():
    """`--prop ve-tiered-bdt` end-to-end through the CLI (gravity on:
    evrard's default gravG exercises the per-substep gravity commit) —
    isolated process, like every multi-program CLI test."""
    r = subprocess.run(
        [sys.executable, "-m", "sphexa_tpu.main", "--init", "evrard",
         "-n", "12", "-s", "2", "--dt0", "1e-4",
         "--prop", "ve-tiered-bdt", "--constants", ""],
        cwd=REPO,
        env=dict(os.environ, SPHEXA_PLATFORM="cpu",
                 SPHEXA_BDT_RUNGS="2"),
        capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    assert "tiered-bdt: active fraction" in r.stdout
    assert r.stdout.count("### Check ###") == 2  # one line per cycle


_HIERARCHY = """
import os
import sys

os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "tests")
import numpy as np
from test_tiered import _periodic_cluster
from sphexa_tpu.propagator.ve_tiered import choose_tiers_auto
from sphexa_tpu.propagator.ve_tiered_bdt import TieredBdtVE

state, box, cfg = _periodic_cluster(20)
p = state.p
alive = np.asarray(p.alive)
tiers = choose_tiers_auto(box, p.x, p.y, p.z, p.h, alive=alive,
                          cap_max=128)
assert len(tiers) >= 2

eng = TieredBdtVE(box, tiers, cfg, num_rungs=3, interpret=True)
bst = eng.bind(state)
diags = []
for _ in range(2):
    bst, ds = eng.run_cycle(bst)
    diags += ds

d = diags[-1]
assert int(d.fold) == 0
hist = np.asarray(d.rung_hist)
assert hist.sum() == alive.sum()
assert (hist > 0).sum() >= 2, f"no dt hierarchy: {hist}"
fr = [float(x.active_frac) for x in diags]
assert min(fr) < 0.9, fr          # gating actually skips work
# conservation across the cycles (pure drift/kick bookkeeping)
e0, e1 = float(diags[0].etot), float(d.etot)
assert abs(e1 - e0) / abs(e0) < 5e-3, (e0, e1)
print("HIERARCHY OK", hist.tolist(), min(fr))
"""


@pytest.mark.medium
def test_tiered_bdt_hierarchy():
    """Multi-rung run on a state with a real dt contrast (the spiked
    corner cluster from test_tiered): rungs spread, compute is gated
    (active fraction < 1 after the cycle start), fail-stops stay
    clean, and energy drifts stay bounded. Runs in its own process —
    the parity test above already compiled one big-constant program in
    this one (docs/DESIGN.md 'Known test-backend pitfall')."""
    r = subprocess.run([sys.executable, "-c", _HIERARCHY], cwd=REPO,
                       env=dict(os.environ), capture_output=True,
                       text=True, timeout=3600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    assert "HIERARCHY OK" in r.stdout
