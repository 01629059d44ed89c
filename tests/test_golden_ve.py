"""fp64 parity test against the reference's hard-coded golden JLoop
values (reference: sph/test/ve.cpp:112-233 with the 99-particle
neighborhood fixture sph/test/example_data.txt, copied verbatim as
numeric data to tests/data/ve_golden_99.txt).

This pins the VE physics formulation bit-for-bit-ish (fp64, analytic
kernel vs the reference's 20k-entry table — agreement to ~1e-6) to the
reference: particle 0 is the target, particles 1..98 its neighbor list.
The production fp32 JAX/Pallas paths are cross-checked against these
same oracle functions elsewhere, closing the chain."""

import os

import numpy as np
import pytest

from sphexa_tpu.sph.kernels import kernel_3d_k
from sphexa_tpu.sfc.box import Box

import oracle

# fixture constants (reference: sph/test/ve.cpp:95-108)
MPART = 3.781038064465603e26
DT = 0.3
ALPHAMIN, ALPHAMAX = 0.05, 1.0
DECAY = 0.2
ATMIN, ATMAX = 0.1, 0.2
RAMP = 1.0 / (ATMAX - ATMIN)
SINC_INDEX = 6.0

COLS = ("x", "y", "z", "vx", "vy", "vz", "h", "c",
        "c11", "c12", "c13", "c22", "c23", "c33",
        "p", "gradh", "rho0", "sumwhrho0", "sumwh",
        "dvxdx", "dvxdy", "dvxdz", "dvydx", "dvydy", "dvydz",
        "dvzdx", "dvzdy", "dvzdz", "alpha", "u", "divv")


@pytest.fixture(scope="module")
def fx():
    path = os.path.join(os.path.dirname(__file__), "data",
                        "ve_golden_99.txt")
    raw = np.loadtxt(path)
    assert raw.shape == (99, 31)
    d = {name: raw[:, i].copy() for i, name in enumerate(COLS)}
    d["m"] = np.full(99, MPART)
    d["K"] = kernel_3d_k(SINC_INDEX)
    # derived exactly as the reference fixture (ve.cpp:83-88)
    d["xm"] = d["m"] / d["rho0"]
    d["kx"] = d["K"] * d["xm"] / d["h"] ** 3
    d["prho"] = d["p"] / (d["kx"] * d["m"] ** 2 * d["gradh"])
    d["box"] = Box.cube(-1e9, 1e9)
    # the fixture's neighbor list: all 98 others for every particle
    within = ~np.eye(99, dtype=bool)
    d["within"] = within
    d["cij"] = tuple(d[k] for k in ("c11", "c12", "c13", "c22", "c23",
                                    "c33"))
    return d


def test_xmass_golden(fx):
    xm = oracle.xmass(fx["x"], fx["y"], fx["z"], fx["h"], fx["m"], fx["K"],
                      fx["box"], within=fx["within"])
    rho0i = MPART / xm[0]
    # 2e-5: the fixture file predates the current reference table (its
    # rho0 column IS the golden value); analytic evaluation agrees to 1.3e-5
    np.testing.assert_allclose(rho0i, 34.515038498081417, rtol=2e-5)


def test_ve_def_gradh_golden(fx):
    kx, gradh = oracle.ve_def_gradh(fx["x"], fx["y"], fx["z"], fx["h"],
                                    fx["m"], fx["xm"], fx["K"], fx["box"],
                                    within=fx["within"])
    np.testing.assert_allclose(kx[0], 1.0042661134076782, rtol=2e-5)
    np.testing.assert_allclose(gradh[0], 0.98699067585409861, rtol=2e-5)
    density = kx[0] * MPART / fx["xm"][0]
    np.testing.assert_allclose(density, 3.4662283566584293e1, rtol=2e-5)


def test_iad_golden(fx):
    volj = fx["xm"] / fx["kx"]
    cij = oracle.iad(fx["x"], fx["y"], fx["z"], fx["h"], fx["K"], fx["box"],
                     volj, within=fx["within"])
    golden = (1.9296619855715329e-18, -1.7838691836843698e-20,
              -1.2892885646884301e-20, 1.9482845913025683e-18,
              1.635410357476855e-20, 1.9246939006338132e-18)
    for got, want in zip((c[0] for c in cij), golden):
        np.testing.assert_allclose(got, want, rtol=2e-5)


def test_divv_curlv_golden(fx):
    divv, curlv, gradv = oracle.divv_curlv(
        fx["x"], fx["y"], fx["z"], fx["vx"], fx["vy"], fx["vz"], fx["h"],
        fx["K"], fx["box"], fx["kx"], fx["xm"], fx["cij"],
        within=fx["within"])
    np.testing.assert_allclose(divv[0], 3.3760353440920682e-2, rtol=1e-5)
    np.testing.assert_allclose(curlv[0], 3.7836647734377962e-2, rtol=1e-5)
    golden_dv = (0.0013578323369918166, 0.02465266861727711,
                 -0.0046604174274769167, 0.022556438947324862,
                 0.0097704904179710741, 0.0098460821566040066)
    for got, want in zip((g[0] for g in gradv), golden_dv):
        np.testing.assert_allclose(got, want, rtol=2e-5)


def test_av_switches_golden(fx):
    alpha = oracle.av_switches(
        fx["x"], fx["y"], fx["z"], fx["vx"], fx["vy"], fx["vz"], fx["h"],
        fx["c"], fx["K"], fx["box"], fx["kx"], fx["xm"], fx["divv"],
        fx["cij"], fx["alpha"], DT, ALPHAMIN, ALPHAMAX, DECAY,
        within=fx["within"])
    np.testing.assert_allclose(alpha[0], 0.93941905320351171, rtol=1e-6)


def _sym_gradv(fx):
    return (fx["dvxdx"], fx["dvxdy"] + fx["dvydx"], fx["dvxdz"] + fx["dvzdx"],
            fx["dvydy"], fx["dvydz"] + fx["dvzdy"], fx["dvzdz"])


def test_momentum_energy_golden_noclean(fx):
    ax, ay, az, du, mvs = oracle.momentum_energy(
        fx["x"], fx["y"], fx["z"], fx["vx"], fx["vy"], fx["vz"], fx["h"],
        fx["m"], fx["prho"], fx["c"], fx["cij"], fx["K"], fx["box"],
        fx["kx"], fx["xm"], fx["alpha"], ATMIN, ATMAX, RAMP,
        within=fx["within"])
    np.testing.assert_allclose(ax[0], -521261.07791667967, rtol=2e-5)
    np.testing.assert_allclose(ay[0], -74471.016515749841, rtol=2e-4)
    np.testing.assert_allclose(az[0], -1730426.827721074, rtol=2e-5)
    np.testing.assert_allclose(du[0], 7.1838438980436924e12, rtol=2e-5)
    np.testing.assert_allclose(mvs[0], 26490876.319252387, rtol=1e-7)


def test_momentum_energy_golden_avclean(fx):
    nc = np.full(99, 98.0)
    ax, ay, az, du, mvs = oracle.momentum_energy(
        fx["x"], fx["y"], fx["z"], fx["vx"], fx["vy"], fx["vz"], fx["h"],
        fx["m"], fx["prho"], fx["c"], fx["cij"], fx["K"], fx["box"],
        fx["kx"], fx["xm"], fx["alpha"], ATMIN, ATMAX, RAMP,
        within=fx["within"], gradv=_sym_gradv(fx), nc=nc)
    np.testing.assert_allclose(ax[0], -505548.68073726865, rtol=2e-5)
    np.testing.assert_allclose(ay[0], 303384.91384746187, rtol=2e-4)
    np.testing.assert_allclose(az[0], -1767463.9739728321, rtol=2e-5)
    np.testing.assert_allclose(du[0], 8.5525242525359648e12, rtol=2e-5)
    np.testing.assert_allclose(mvs[0], 26490876.319252387, rtol=1e-7)
