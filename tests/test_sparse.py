"""Sparse (DTC) GP: math, device-state masquerade, SafeOpt integration."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from safeopt_tpu import SafeOpt, linearly_spaced_combinations
from safeopt_tpu.gp import GPRegression, RBF
from safeopt_tpu.gp.sparse import SparseGPRegression
from safeopt_tpu.gp.regression import gp_predict

from reference_impl import RefRBF

def _data(n=60, seed=13):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-4, 4, size=(n, 1))
    y = np.sin(X[:, 0]) + 0.05 * rng.normal(size=n)
    return X, y[:, None]


def test_dtc_matches_dense_formula():
    """Posterior equals the direct dense DTC computation."""
    X, Y = _data(40)
    kern = RBF(1, variance=2.0, lengthscale=1.0)
    s2 = 0.01
    gp = SparseGPRegression(X, Y, kern, noise_var=s2, inducing=10)
    Z = gp.Z
    Xq = np.linspace(-4, 4, 15)[:, None]

    # dense reference
    rk = RefRBF(1, variance=2.0, lengthscale=1.0)
    Kzz = rk.K(Z) + 1e-8 * np.eye(len(Z))
    Kzx = rk.K(Z, X)
    Kzq = rk.K(Z, Xq)
    A = Kzz + Kzx @ Kzx.T / s2
    alpha = np.linalg.solve(A, Kzx @ Y[:, 0]) / s2
    mu_ref = Kzq.T @ alpha
    B = np.linalg.inv(Kzz) - np.linalg.inv(A)
    var_ref = rk.Kdiag(Xq) - np.einsum("mq,mk,kq->q", Kzq, B, Kzq)

    mu, var = gp.predict_noiseless(Xq)
    assert_allclose(mu[:, 0], mu_ref, rtol=1e-7, atol=1e-9)
    assert_allclose(var[:, 0], np.maximum(var_ref, 0), rtol=1e-6,
                    atol=1e-8)


def test_device_state_matches_host_posterior():
    """The GPState masquerade reproduces the host DTC posterior through
    the same jitted gp_predict the fused step uses."""
    X, Y = _data(50)
    kern = RBF(1, variance=2.0)
    gp = SparseGPRegression(X, Y, kern, noise_var=0.01, inducing=12)
    Xq = np.linspace(-4, 4, 23)[:, None]
    mu_h, var_h = gp.predict_noiseless(Xq)
    mu_d, var_d = gp_predict(kern, gp.state, Xq)
    assert_allclose(np.asarray(mu_d), mu_h[:, 0], rtol=1e-8, atol=1e-10)
    assert_allclose(np.asarray(var_d), var_h[:, 0], rtol=1e-7, atol=1e-9)


def test_inducing_equals_data_recovers_exact_gp():
    """With Z = X the DTC posterior is the exact GP posterior."""
    X, Y = _data(20)
    kern = RBF(1, variance=2.0)
    sparse = SparseGPRegression(X, Y, kern, noise_var=0.01, inducing=X)
    exact = GPRegression(X, Y, kern, noise_var=0.01)
    Xq = np.linspace(-4, 4, 17)[:, None]
    mu_s, var_s = sparse.predict_noiseless(Xq)
    mu_e, var_e = exact.predict_noiseless(Xq)
    assert_allclose(mu_s, np.asarray(mu_e), rtol=1e-5, atol=1e-7)
    assert_allclose(var_s, np.asarray(var_e), rtol=1e-4, atol=1e-6)


def test_safeopt_runs_on_sparse_gp():
    """SafeOpt consumes a sparse GP through the same fused pipeline."""
    rk = RefRBF(1, variance=2.0)

    def f(x):
        return rk.K(np.atleast_2d(x), [[0.0], [2.0]]) @ np.array([2.0, 1.0])

    X0 = np.array([[0.0], [0.3], [-0.3]])
    Y0 = f(X0)[:, None]
    gp = SparseGPRegression(X0, Y0, RBF(1, variance=2.0), noise_var=1e-3,
                            inducing=8)
    grid = linearly_spaced_combinations([(-5.0, 5.0)], 120)
    opt = SafeOpt(gp, grid, fmin=[0.0], threshold=0.1)
    for _ in range(5):
        x = opt.optimize()
        assert -5.0 <= float(x[0]) <= 5.0
        opt.add_new_data_point(x, float(f(x[None, :])[0]))
    assert gp.num_data == 8          # data grew
    assert gp.num_inducing == 8      # factor size bounded
    x_best, lb = opt.get_maximum()
    assert np.isfinite(lb)


def test_safeoptswarm_runs_on_sparse_gp():
    """SafeOptSwarm (fused path) on a sparse model: greedy specials
    must come from the observation store, not the inducing points."""
    import jax

    from safeopt_tpu import SafeOptSwarm

    rng = np.random.default_rng(3)
    X0 = rng.uniform(-0.5, 0.5, size=(6, 2))
    Y0 = (2.0 * np.exp(-0.5 * np.sum(X0 ** 2, axis=1)))[:, None]
    gp = SparseGPRegression(X0, Y0, RBF(2, variance=2.0), noise_var=1e-3,
                            inducing=5)
    opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[(-2.0, 2.0)] * 2,
                       swarm_size=10, key=jax.random.key(1))
    for _ in range(3):
        x = opt.optimize()
        assert np.all(np.abs(x) <= 2.0)
        y = float(2.0 * np.exp(-0.5 * np.sum(x ** 2)))
        opt.add_new_data_point(x, y)
    assert gp.num_data == 9
    assert gp.num_inducing == 5
