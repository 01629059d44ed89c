"""Per-substep fold decomposition for the tiered-BDT hierarchy
scenario (fold=72 in the first run of test_tiered_bdt_hierarchy)."""

import sys
sys.path.insert(0, "tests")

import numpy as np

from test_tiered import _periodic_cluster  # noqa: E402
from sphexa_tpu.propagator.ve_tiered import audit_tiers, choose_tiers
from sphexa_tpu.propagator.ve_tiered_bdt import TieredBdtVE

state, box, cfg = _periodic_cluster(20)
p = state.p
alive = np.asarray(p.alive)
tiers = choose_tiers(box, p.x, p.y, p.z, p.h, alive=alive, cap_max=128)
print("tiers:", [(f"{t.h_lo:.4g}", f"{t.h_hi:.4g}",
                  t.grid.n, t.grid.cap) for t in tiers])
assert audit_tiers(tiers, box, p.x, p.y, p.z, p.h, alive=alive) == 0

eng = TieredBdtVE(box, tiers, cfg, num_rungs=3, interpret=True)
bst = eng.bind(state)
for s in range(8):
    bst, d = eng.substep(bst)
    print(f"substep {s}: fold={int(d.fold)} "
          f"parts(ovf,unown,miss,clamp)={np.asarray(d.fold_parts).tolist()} "
          f"af={float(d.active_frac):.3f} dt={float(d.dt):.3g} "
          f"rungs={np.asarray(d.rung_hist).tolist()}")
