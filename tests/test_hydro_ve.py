"""VE pipeline stages vs the independent fp64 all-pairs oracle
(reference analog: sph/test/ve.cpp golden-number tests, but against a
recomputed oracle instead of hard-coded values; tolerance is fp32-level
instead of the reference's fp64 2e-9)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexa_tpu.config import SphConfig
from sphexa_tpu.neighbors import CellGrid, build_cell_list, build_neighbor_list, choose_level
from sphexa_tpu.sfc.box import Box, Boundary
from sphexa_tpu.sph import hydro_ve
from sphexa_tpu.sph.eos import eos_ve
from sphexa_tpu.sph.kernels import kernel_3d_k

import oracle


@pytest.fixture(scope="module")
def cloud():
    """A perturbed lattice with ~100 neighbors each + random velocities."""
    rng = np.random.default_rng(1234)
    side = 12
    g = (np.arange(side) + 0.5) / side - 0.5
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    n = side ** 3
    x = X.ravel() + rng.normal(0, 0.1 / side, n)
    y = Y.ravel() + rng.normal(0, 0.1 / side, n)
    z = Z.ravel() + rng.normal(0, 0.1 / side, n)
    box = Box.cube(-0.5, 0.5, Boundary.periodic)
    h = np.full(n, 0.5 * (3.0 / (4 * np.pi) * 100 / n) ** (1 / 3))
    h *= rng.uniform(0.95, 1.05, n)
    m = np.full(n, 1.0 / n)
    vx, vy, vz = (rng.normal(0, 0.1, n) for _ in range(3))
    temp = rng.uniform(0.5, 2.0, n) * 1e-7
    alpha = np.full(n, 0.3)
    return dict(x=x, y=y, z=z, h=h, m=m, vx=vx, vy=vy, vz=vz, temp=temp,
                alpha=alpha, box=box, n=n)


@pytest.fixture(scope="module")
def pipeline(cloud):
    """Run the JAX pipeline once; also compute the oracle chain in fp64."""
    c = cloud
    box = c["box"]
    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256)
    grid = CellGrid(choose_level(box, float(c["h"].max())))

    xs, ys, zs, hs = (jnp.asarray(c[k], jnp.float32) for k in "xyzh")
    cl = build_cell_list(grid, box, xs, ys, zs)
    p = np.asarray(cl.perm)
    xs, ys, zs, hs = xs[p], ys[p], zs[p], hs[p]
    fields = {k: jnp.asarray(c[k], jnp.float32)[p]
              for k in ("m", "vx", "vy", "vz", "temp", "alpha")}
    nl = build_neighbor_list(grid, box, cl, xs, ys, zs, hs, cfg, adapt_h=False)
    idx, nc = nl.idx, nl.nc

    K3d = kernel_3d_k(cfg.sinc_index)
    xm = hydro_ve.compute_xmass(box, xs, ys, zs, hs, fields["m"], idx, nc, cfg)
    kx, gradh = hydro_ve.compute_ve_def_gradh(box, xs, ys, zs, hs, fields["m"],
                                              xm, idx, nc, cfg)
    rho, pres, csnd, prho = eos_ve(fields["temp"], fields["m"], kx, xm, gradh,
                                   cfg.mui, cfg.gamma)
    iad = hydro_ve.compute_iad_divv_curlv(box, xs, ys, zs, fields["vx"],
                                          fields["vy"], fields["vz"], hs, kx,
                                          xm, idx, nc, cfg)
    cij = (iad.c11, iad.c12, iad.c13, iad.c22, iad.c23, iad.c33)
    dt = 1e-5
    alpha_new = hydro_ve.compute_av_switches(
        box, xs, ys, zs, fields["vx"], fields["vy"], fields["vz"], hs, csnd,
        kx, xm, iad.divv, cij, fields["alpha"], dt, idx, nc, cfg)
    me = hydro_ve.compute_momentum_energy(
        box, xs, ys, zs, fields["vx"], fields["vy"], fields["vz"], hs,
        fields["m"], prho, csnd, cij, kx, xm, fields["alpha"], idx, nc, cfg)

    # --- oracle chain in fp64 on the same (sorted) configuration ---
    xo, yo, zo, ho = c["x"][p], c["y"][p], c["z"][p], c["h"][p]
    mo = c["m"][p]
    vxo, vyo, vzo = c["vx"][p], c["vy"][p], c["vz"][p]
    to, ao = c["temp"][p], c["alpha"][p]
    within = oracle.all_pairs_neighbors(xo, yo, zo, ho, box)
    xm_o = oracle.xmass(xo, yo, zo, ho, mo, K3d, box, within)
    kx_o, gradh_o = oracle.ve_def_gradh(xo, yo, zo, ho, mo, xm_o, K3d, box, within)
    rho_o, p_o, c_o, prho_o = oracle.eos_ve(to, mo, kx_o, xm_o, gradh_o,
                                            cfg.mui, cfg.gamma)
    volj = xm_o / kx_o
    cij_o = oracle.iad(xo, yo, zo, ho, K3d, box, volj, within)
    divv_o, curlv_o, gradv_o = oracle.divv_curlv(xo, yo, zo, vxo, vyo, vzo, ho,
                                                 K3d, box, kx_o, xm_o, cij_o,
                                                 within)
    alpha_o = oracle.av_switches(xo, yo, zo, vxo, vyo, vzo, ho, c_o, K3d, box,
                                 kx_o, xm_o, divv_o, cij_o, ao, dt,
                                 cfg.alphamin, cfg.alphamax, cfg.decay_constant,
                                 within)
    me_o = oracle.momentum_energy(xo, yo, zo, vxo, vyo, vzo, ho, mo, prho_o,
                                  c_o, cij_o, K3d, box, kx_o, xm_o, ao,
                                  cfg.atmin, cfg.atmax, cfg.ramp, within)
    return dict(xm=xm, kx=kx, gradh=gradh, rho=rho, prho=prho, c=csnd,
                iad=iad, alpha=alpha_new, me=me,
                xm_o=xm_o, kx_o=kx_o, gradh_o=gradh_o, rho_o=rho_o,
                prho_o=prho_o, c_o=c_o, cij_o=cij_o, divv_o=divv_o,
                curlv_o=curlv_o, alpha_o=alpha_o, me_o=me_o)


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    scale = np.abs(b).max() + 1e-300
    return np.abs(a - b).max() / scale


def test_xmass(pipeline):
    assert rel_err(pipeline["xm"], pipeline["xm_o"]) < 2e-5


def test_kx_gradh(pipeline):
    assert rel_err(pipeline["kx"], pipeline["kx_o"]) < 2e-5
    assert rel_err(pipeline["gradh"], pipeline["gradh_o"]) < 5e-4


def test_eos(pipeline):
    assert rel_err(pipeline["rho"], pipeline["rho_o"]) < 2e-5
    assert rel_err(pipeline["c"], pipeline["c_o"]) < 2e-5
    assert rel_err(pipeline["prho"], pipeline["prho_o"]) < 5e-4


def test_iad(pipeline):
    iad = pipeline["iad"]
    for got, want in zip((iad.c11, iad.c12, iad.c13, iad.c22, iad.c23, iad.c33),
                         pipeline["cij_o"]):
        assert rel_err(got, want) < 2e-4


def test_divv_curlv(pipeline):
    assert rel_err(pipeline["iad"].divv, pipeline["divv_o"]) < 5e-4
    assert rel_err(pipeline["iad"].curlv, pipeline["curlv_o"]) < 5e-4


def test_av_switches(pipeline):
    assert rel_err(pipeline["alpha"], pipeline["alpha_o"]) < 1e-3


def test_momentum_energy(pipeline):
    me, me_o = pipeline["me"], pipeline["me_o"]
    assert rel_err(me.ax, me_o[0]) < 2e-3
    assert rel_err(me.ay, me_o[1]) < 2e-3
    assert rel_err(me.az, me_o[2]) < 2e-3
    assert rel_err(me.du, me_o[3]) < 2e-3
    assert rel_err(me.maxvsignal, me_o[4]) < 1e-4


def test_momentum_energy_av_clean(cloud, pipeline):
    """avClean velocity-gradient correction vs oracle
    (reference: momentum_energy_kern.hpp:44-63 avRvCorrection)."""
    c = cloud
    box = c["box"]
    cfg = SphConfig(chunk=512, cell_cap=256, ngpad=256, av_clean=True)
    grid = CellGrid(choose_level(box, float(c["h"].max())))
    xs, ys, zs, hs = (jnp.asarray(c[k], jnp.float32) for k in "xyzh")
    cl = build_cell_list(grid, box, xs, ys, zs)
    p = np.asarray(cl.perm)
    xs, ys, zs, hs = xs[p], ys[p], zs[p], hs[p]
    f = {k: jnp.asarray(c[k], jnp.float32)[p]
         for k in ("m", "vx", "vy", "vz", "temp", "alpha")}
    nl = build_neighbor_list(grid, box, cl, xs, ys, zs, hs, cfg,
                             adapt_h=False)

    xm = hydro_ve.compute_xmass(box, xs, ys, zs, hs, f["m"], nl.idx, nl.nc, cfg)
    kx, gradh = hydro_ve.compute_ve_def_gradh(box, xs, ys, zs, hs, f["m"],
                                              xm, nl.idx, nl.nc, cfg)
    _, _, csnd, prho = eos_ve(f["temp"], f["m"], kx, xm, gradh,
                              cfg.mui, cfg.gamma)
    iad = hydro_ve.compute_iad_divv_curlv(box, xs, ys, zs, f["vx"], f["vy"],
                                          f["vz"], hs, kx, xm, nl.idx, nl.nc,
                                          cfg)
    cij = (iad.c11, iad.c12, iad.c13, iad.c22, iad.c23, iad.c33)
    gradv = (iad.dV11, iad.dV12, iad.dV13, iad.dV22, iad.dV23, iad.dV33)
    me = hydro_ve.compute_momentum_energy(
        box, xs, ys, zs, f["vx"], f["vy"], f["vz"], hs, f["m"], prho, csnd,
        cij, kx, xm, f["alpha"], nl.idx, nl.nc, cfg, gradv=gradv)

    # oracle with avClean
    xo, yo, zo, ho, mo = (c[k][p] for k in ("x", "y", "z", "h", "m"))
    vxo, vyo, vzo = c["vx"][p], c["vy"][p], c["vz"][p]
    K3d = kernel_3d_k(cfg.sinc_index)
    within = oracle.all_pairs_neighbors(xo, yo, zo, ho, box)
    xm_o = oracle.xmass(xo, yo, zo, ho, mo, K3d, box, within)
    kx_o, gradh_o = oracle.ve_def_gradh(xo, yo, zo, ho, mo, xm_o, K3d, box,
                                        within)
    _, _, c_o, prho_o = oracle.eos_ve(c["temp"][p], mo, kx_o, xm_o, gradh_o,
                                      cfg.mui, cfg.gamma)
    cij_o = oracle.iad(xo, yo, zo, ho, K3d, box, xm_o / kx_o, within)
    _, _, gradv_o = oracle.divv_curlv(xo, yo, zo, vxo, vyo, vzo, ho, K3d,
                                      box, kx_o, xm_o, cij_o, within)
    me_o = oracle.momentum_energy(xo, yo, zo, vxo, vyo, vzo, ho, mo, prho_o,
                                  c_o, cij_o, K3d, box, kx_o, xm_o,
                                  c["alpha"][p], cfg.atmin, cfg.atmax,
                                  cfg.ramp, within, gradv=gradv_o,
                                  nc=within.sum(1))
    assert rel_err(me.ax, me_o[0]) < 5e-3
    assert rel_err(me.du, me_o[3]) < 5e-3
