"""Native C++ factor engine vs the SciPy reference path."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from safeopt_tpu import native
from safeopt_tpu.gp.host_math import HostFactor, np_kernel
from safeopt_tpu.gp.kernels import Exponential, Matern32, Matern52, RBF

RNG = np.random.default_rng(11)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine did not build")


@pytest.mark.parametrize("kind,kern", [
    ("rbf", RBF(3, variance=2.0, lengthscale=[0.5, 1.0, 2.0], ARD=True)),
    ("matern32", Matern32(2, variance=1.5, lengthscale=0.7)),
    ("matern52", Matern52(2, variance=2.5, lengthscale=1.3)),
    ("exponential", Exponential(2, variance=1.2, lengthscale=0.9)),
])
def test_gram_matches_numpy(kind, kern):
    d = kern.input_dim
    X = RNG.normal(size=(12, d))
    Z = RNG.normal(size=(7, d))
    out = native.gram(kind, X, Z, np.asarray(kern.lengthscale),
                      float(kern.variance))
    assert_allclose(out, np_kernel(kern, X, Z), rtol=1e-13, atol=1e-14)


def test_cholesky_and_inverse_match_scipy():
    import scipy.linalg

    n, cap = 20, 32
    A = RNG.normal(size=(n, n))
    K = A @ A.T + n * np.eye(n)
    buf = np.eye(cap)
    buf[:n, :n] = K
    native.cholesky_lower(buf, n)
    L_ref = scipy.linalg.cholesky(K, lower=True)
    assert_allclose(buf[:n, :n], L_ref, rtol=1e-11, atol=1e-12)

    inv = np.eye(cap)
    native.tri_inverse_lower(buf, n, inv)
    assert_allclose(inv[:n, :n],
                    scipy.linalg.solve_triangular(L_ref, np.eye(n),
                                                  lower=True),
                    rtol=1e-10, atol=1e-12)


def test_cholesky_rejects_indefinite():
    buf = np.eye(8)
    buf[0, 0] = -1.0
    with pytest.raises(np.linalg.LinAlgError):
        native.cholesky_lower(buf, 2)


def test_host_factor_native_vs_scipy_paths():
    """Full HostFactor lifecycle agrees across both backends."""
    kern = RBF(2, variance=2.0, lengthscale=0.8)
    X = RNG.uniform(-2, 2, size=(9, 2))
    Y = RNG.normal(size=(9, 1))

    hf_native = HostFactor(kern, 16, 2, 0.01)
    hf_scipy = HostFactor(kern, 16, 2, 0.01)
    hf_scipy._use_native = False

    hf_native.set_data(X, Y)
    hf_scipy.set_data(X, Y)
    assert_allclose(hf_native.L, hf_scipy.L, rtol=1e-10, atol=1e-12)
    assert_allclose(hf_native.Linv, hf_scipy.Linv, rtol=1e-9, atol=1e-11)
    assert_allclose(hf_native.w, hf_scipy.w, rtol=1e-9, atol=1e-11)

    for i in range(4):
        x = RNG.uniform(-2, 2, size=2)
        y = float(RNG.normal())
        hf_native.append(x, y)
        hf_scipy.append(x, y)
    assert_allclose(hf_native.L, hf_scipy.L, rtol=1e-9, atol=1e-11)
    assert_allclose(hf_native.Linv, hf_scipy.Linv, rtol=1e-9, atol=1e-11)
    assert_allclose(hf_native.w, hf_scipy.w, rtol=1e-9, atol=1e-11)
