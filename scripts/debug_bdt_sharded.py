"""Debug: compare single-chip vs sharded BDT substep-0 outputs per gid."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from sphexa_tpu.config import SphConfig
from sphexa_tpu.domain.slab import AXIS, SlabConfig
from sphexa_tpu.init.sedov import init_sedov
from sphexa_tpu.ops.cellmajor import CMGrid
from sphexa_tpu.propagator.ve_bdt import BdtVE
from sphexa_tpu.propagator.ve_bdt_sharded import ShardedBdtVE

cfg = SphConfig(cell_cap=256, ngpad=256)
state, box, cfg = init_sedov(10, cfg, dt0=2e-4)
n = 10 ** 3
print("box periodic:", box.periodic)

grid1 = CMGrid(n=4, cap=128)
bdt1 = BdtVE(box, grid1, cfg, num_rungs=3, interpret=True)
bst1 = bdt1.bind_bdt(state)
bst1, d1 = bdt1.substep(bst1)

D = 2
state2, _, _ = init_sedov(10, cfg, dt0=2e-4)
mesh = Mesh(np.array(jax.devices()[:D]), (AXIS,))
gridL = CMGrid(n=4, cap=128, nzi=4 // D)
sc = SlabConfig(n_slabs=D, cap=(n // D) * 2 + 64, halo_cap=8, mig_cap=128)
bdtN = ShardedBdtVE(box, gridL, cfg, sc, mesh, num_rungs=3, interpret=True)
bstN = bdtN.distribute_bind(state2)
bstN, dN = bdtN.substep(bstN)

print("hist1:", np.asarray(d1.rung_hist), " histN:", np.asarray(dN.rung_hist))
print("dt1:", float(d1.dt), " dtN:", float(dN.dt))
print("eint:", float(d1.eint), float(dN.eint))
print("ecin:", float(d1.ecin), float(dN.ecin))

# continue through two full cycles, comparing every substep
for cyc in range(2):
    for s in range(4):
        if cyc == 0 and s == 0:
            continue  # already done above
        if s == 0:
            bst1, _ = bdt1.resync(bst1)
            bstN, lost = bdtN.resync(bstN)
            print(f"resync lost={int(lost)}")
        bst1, d1 = bdt1.substep(bst1)
        bstN, dN = bdtN.substep(bstN)
        h1 = np.asarray(d1.rung_hist)
        hN = np.asarray(dN.rung_hist)
        print(f"cyc {cyc} sub {s}: hist1={h1} histN={hN} "
              f"af1={float(d1.active_frac):.4f} afN={float(dN.active_frac):.4f} "
              f"ecin {float(d1.ecin):.6e} {float(dN.ecin):.6e} "
              f"{'MATCH' if (h1 == hN).all() else 'DIVERGE'}")


def by_gid(bst, eng, fields):
    rv = bst.rv
    im = np.asarray(eng.intmask)
    im = np.tile(im, len(np.asarray(rv.valid)) // len(im))
    validint = np.asarray(rv.valid) & im
    gid = np.asarray(rv.gid)[validint].astype(np.int64)
    out = {}
    for name in fields:
        src = getattr(bst, name, None)
        if src is None:
            src = getattr(rv, name)
        col = np.asarray(src)[validint]
        buf = np.zeros(n, np.float32)
        buf[gid] = col
        out[name] = buf
    return out

f1 = by_gid(bst1, bdt1, ["rung", "h", "axk", "duk", "x", "vx", "dt_m1k"])
fN = by_gid(bstN, bdtN, ["rung", "h", "axk", "duk", "x", "vx", "dt_m1k"])
for k in f1:
    diff = np.abs(f1[k] - fN[k])
    scale = np.abs(f1[k]).max() + 1e-12
    bad = np.argsort(-diff)[:5]
    print(f"{k}: maxdiff {diff.max():.3e} (rel {diff.max()/scale:.3e}) "
          f"nbad>{1e-4*scale:.1e}: {(diff > 1e-4*scale).sum()} "
          f"worst gids {bad.tolist()}")

# where do the rung disagreements live spatially?
dis = np.flatnonzero(np.round(f1["rung"]) != np.round(fN["rung"]))
alive = np.asarray(state.p.alive)
zs = np.asarray(state.p.z)
print("rung disagreements:", len(dis))
if len(dis):
    print("z range of disagreements:", zs[dis].min(), zs[dis].max())
    print("global z range:", zs[alive].min(), zs[alive].max())
