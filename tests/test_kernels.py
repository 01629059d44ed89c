"""Smoothing-kernel math vs float64 references (reference test analog:
sph/test/table_creation.cpp and kernel golden values in sph/test/ve.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexa_tpu.sph import kernels as K
from sphexa_tpu.util.kahan import kahan_sum


def test_normalization_constant_matches_sphynx_interpolant():
    """kernel_3D_k for sinc^n should be close to the published SPHYNX
    interpolation formula (reference: sph_kernel_tables.hpp:63-74)."""
    for n in (5.0, 6.0, 7.0):
        b0, b1, b2, b3 = 2.7012593e-2, 2.0410827e-2, 3.7451957e-3, 4.7013839e-2
        sphynx = b0 + b1 * np.sqrt(n) + b2 * n + b3 * np.sqrt(n ** 3)
        ours = K.kernel_3d_k(n)
        assert abs(ours - sphynx) / sphynx < 2e-3


def test_device_kernel_matches_host():
    v = np.linspace(0.0, 2.2, 1001)
    host = K.wharmonic_np(v) ** 6.0
    host[v >= 2.0] = 0.0
    dev = np.asarray(K.w_sinc(jnp.asarray(v, jnp.float32), 6.0))
    np.testing.assert_allclose(dev, host, atol=2e-6)


def test_device_derivative_matches_host():
    v = np.linspace(1e-3, 1.999, 997)
    host = 6.0 * K.wharmonic_np(v) ** 5.0 * K.wharmonic_derivative_np(v)
    dev = np.asarray(K.w_sinc_derivative(jnp.asarray(v, jnp.float32), 6.0))
    np.testing.assert_allclose(dev, host, atol=5e-5)


def test_table_lookup_matches_analytic():
    wh, _ = K.make_tables(6.0)
    v = np.linspace(0.0, 1.999, 1234)
    via_table = np.asarray(K.table_lookup(jnp.asarray(wh), jnp.asarray(v, jnp.float32)))
    analytic = K.wharmonic_np(v) ** 6.0
    np.testing.assert_allclose(via_table, analytic, atol=1e-5)


def test_table_lookup_zero_outside_support():
    wh, _ = K.make_tables(6.0)
    v = jnp.asarray([2.0, 2.5, 10.0], jnp.float32)
    np.testing.assert_array_equal(np.asarray(K.table_lookup(jnp.asarray(wh), v)), 0.0)


def test_update_h_fixed_point():
    h = jnp.asarray([0.5], jnp.float32)
    nc = jnp.asarray([100], jnp.int32)
    out = K.update_h(100, nc, h)
    np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-6)
    # monotonic: fewer neighbors -> larger h
    assert float(K.update_h(100, jnp.asarray([50]), h)[0]) > 0.5
    assert float(K.update_h(100, jnp.asarray([200]), h)[0]) < 0.5


def test_artificial_viscosity():
    # approaching pair (w_ij < 0) -> positive viscosity; receding -> zero
    av = K.artificial_viscosity(1.0, 1.0, 1.0, 1.0, jnp.float32(-0.5))
    expected = (0.5 * 2.0 + 2.0 * 0.5) * 0.5  # vsignal=(2/4*2 + 2*0.5)=2, *0.5
    np.testing.assert_allclose(float(av), expected, rtol=1e-6)
    assert float(K.artificial_viscosity(1.0, 1.0, 1.0, 1.0, jnp.float32(0.5))) == 0.0


def test_kahan_sum_accuracy():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(300_000) * 1e4).astype(np.float32)
    exact = np.sum(x.astype(np.float64))
    naive = float(np.sum(x))
    comp = float(kahan_sum(jnp.asarray(x)))
    assert abs(comp - exact) <= max(abs(naive - exact), 1e-2)
    np.testing.assert_allclose(comp, exact, rtol=1e-6)
