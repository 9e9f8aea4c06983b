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


def test_native_ratquad_matches_numpy():
    from safeopt_tpu import native
    from safeopt_tpu.gp import RatQuad
    from safeopt_tpu.gp.host_math import np_kernel

    if not native.available():
        import pytest
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, size=(7, 2))
    Z = rng.uniform(-2, 2, size=(5, 2))
    kern = RatQuad(2, variance=1.7, lengthscale=[0.8, 1.6], power=1.3,
                   ARD=True)
    got = native.gram("ratquad", X, Z, np.asarray(kern.lengthscale),
                      1.7, power=1.3)
    np.testing.assert_allclose(got, np_kernel(kern, X, Z), rtol=1e-12)


def test_native_stdperiodic_matches_numpy():
    from safeopt_tpu import native
    from safeopt_tpu.gp import StdPeriodic
    from safeopt_tpu.gp.host_math import np_kernel

    if not native.available():
        import pytest
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(1)
    X = rng.uniform(-2, 2, size=(6, 2))
    Z = rng.uniform(-2, 2, size=(4, 2))
    kern = StdPeriodic(2, variance=2.1, period=[1.5, 2.5],
                       lengthscale=0.7, ARD1=True)
    got = native.gram("stdperiodic", X, Z, np.asarray(kern.lengthscale),
                      2.1, period=np.asarray(kern.period))
    np.testing.assert_allclose(got, np_kernel(kern, X, Z), rtol=1e-12)


def test_hostfactor_native_dispatch_new_kernels():
    """GPRegression on RatQuad/StdPeriodic rides the native gram when
    available and stays equal to the NumPy path."""
    from safeopt_tpu import native
    from safeopt_tpu.gp import GPRegression, RatQuad, StdPeriodic
    from safeopt_tpu.gp.host_math import _native_kind

    rng = np.random.default_rng(2)
    X = rng.uniform(-2, 2, size=(12, 2))
    Y = np.sin(X[:, :1]) + 0.05 * rng.normal(size=(12, 1))
    for kern in (RatQuad(2, variance=1.5, power=1.1),
                 StdPeriodic(2, variance=1.5, period=2.0)):
        assert _native_kind(kern) is not None
        gp = GPRegression(X, Y, kern, noise_var=0.01)
        if native.available():
            assert gp._host._use_native
        mu, var = gp.predict_noiseless(X[:4])
        assert np.all(np.isfinite(np.asarray(mu)))
        assert np.all(np.asarray(var) >= 0)
