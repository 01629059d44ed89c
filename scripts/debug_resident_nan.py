"""Bisect the resident-engine NaN with mxu_momentum on (CPU interpret)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("JAX_PLATFORMS", None)
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sphexa_tpu.config import SphConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.ops.cellmajor import choose_cm_grid
from sphexa_tpu.propagator.ve_pallas import ResidentVE

mm = len(sys.argv) > 1 and sys.argv[1] == "mm"
cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256,
                mxu_momentum=mm)
state, box, cfg = init_sedov(12, cfg, dt0=2e-4)
h0 = float(state.p.h[0])
grid = choose_cm_grid(box, h0 * 1.3, 12 ** 3, cap=256)
eng = ResidentVE(box, grid, cfg, interpret=True)
rst = eng.bind(state)
print("mxu_momentum =", cfg.mxu_momentum, "grid", grid)
for i in range(4):
    if i == 2:
        rst = rst.replace(drift=jnp.float32(1e9))
    rst, dr = eng.step(rst)
    bad = {}
    for f in ("x", "vx", "temp", "h", "alpha"):
        row = np.asarray(getattr(rst, f))
        v = np.asarray(rst.valid)
        bad[f] = int(np.sum(~np.isfinite(row[v])))
    print(f"step {i}: dt={float(dr.dt):.6g} eint={float(dr.eint):.6g} "
          f"nan(valid)={bad}")
