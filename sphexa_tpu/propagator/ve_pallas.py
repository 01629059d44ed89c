"""VE propagator on the Pallas cell-major fast path (single chip).

Same physics and step choreography as propagator/ve.py; the five pair
stages and the h/neighbor-count iteration run as Pallas kernels over the
cell-major layout (ops/cellmajor.py, ops/pallas_ve.py) instead of
gather-based XLA stages. This is the production TPU path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sphexa_tpu.config import SphConfig
from sphexa_tpu.ops.cellmajor import (CMGrid, build_layout, from_cm,
                                      refresh_ghosts, to_cm)
from sphexa_tpu.ops.pallas_ve import PallasVE
from sphexa_tpu.propagator.common import finish_step
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.sph.eos import eos_ve



def make_ve_step_pallas(box: Box, grid: CMGrid, cfg: SphConfig,
                        interpret: bool = False):
    pve = PallasVE(grid, cfg, interpret=interpret)

    @jax.jit
    def step(state):
        ps = state.p
        n = ps.n
        layout = build_layout(grid, box, ps.x, ps.y, ps.z, alive=ps.alive)

        base = pve.base_rows(layout, ps.x, ps.y, ps.z, ps.h)
        m_cm = to_cm(layout, ps.m)
        vx_cm = to_cm(layout, ps.vx)
        vy_cm = to_cm(layout, ps.vy)
        vz_cm = to_cm(layout, ps.vz)
        temp_cm = to_cm(layout, ps.temp)
        alpha_cm = to_cm(layout, ps.alpha)

        adapt_ok = layout.valid & layout.interior

        # ---- coupled h / neighbor-count iteration (nc kernel + controller)
        from sphexa_tpu.sph.kernels import update_h
        ngmin = cfg.ng0 // 4
        nc = pve.nc(base)
        for _ in range(cfg.h_iter):
            nc_sph = nc + 1.0
            need = adapt_ok & ((nc_sph < ngmin) | (nc > cfg.ngmax))
            h_new = jnp.where(need, update_h(cfg.ng0, nc_sph, base[3]),
                              base[3])
            base[3] = refresh_ghosts(layout, h_new)
            nc = pve.nc(base)
        nc_sph_cm = nc + 1.0
        h_cm = base[3]

        # ---- pair stages with ghost refreshes between them ----
        xm = refresh_ghosts(layout, pve.xmass(base, m_cm))
        kx, gradh = pve.gradh(base, m_cm, xm)
        rho, p, c, prho = eos_ve(temp_cm, m_cm, kx, xm, gradh,
                                 cfg.mui, cfg.gamma)
        kx = refresh_ghosts(layout, kx)
        c = refresh_ghosts(layout, c)
        prho = refresh_ghosts(layout, prho)

        cij, divv, curlv, gradv = pve.iad_divv(base, kx, xm, vx_cm, vy_cm,
                                               vz_cm)
        cij = tuple(refresh_ghosts(layout, v) for v in cij)
        divv = refresh_ghosts(layout, divv)

        alpha = pve.av_switches(base, c, kx, xm, divv, vx_cm, vy_cm, vz_cm,
                                cij, alpha_cm, state.dt)
        alpha = jnp.where(adapt_ok, alpha, alpha_cm)
        alpha = refresh_ghosts(layout, alpha)

        ax, ay, az, du, maxvsig = pve.momentum(base, vx_cm, vy_cm, vz_cm, c,
                                               prho, kx, xm, alpha, m_cm, cij)

        # ---- back to the particle frame ----
        back = lambda f, fill=0.0: from_cm(layout, f, n, fill)
        ps = ps.replace(h=back(h_cm, 1.0), alpha=back(alpha, cfg.alphamin))
        max_nc = jnp.max(jnp.where(adapt_ok, nc, 0.0))
        new_state, diag = finish_step(
            state, ps, back(ax), back(ay), back(az), back(du),
            back(maxvsig), back(c, 1.0), back(divv), back(nc_sph_cm, 1.0),
            box, cfg,
            max_nc=max_nc.astype(jnp.int32),
            max_cell_count=layout.overflow.astype(jnp.int32))
        return new_state, diag

    return step
