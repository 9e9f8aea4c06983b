"""Checkpoint / resume roundtrips for both algorithms."""

import numpy as np
from numpy.testing import assert_allclose

from safeopt_tpu import SafeOpt, SafeOptSwarm, linearly_spaced_combinations
from safeopt_tpu.gp import GPRegression, Matern32, RBF
from safeopt_tpu.utils import checkpoint


def test_safeopt_roundtrip(tmp_path):
    kern_f = RBF(1, variance=2.0, lengthscale=0.8)
    kern_g = Matern32(1, variance=1.5)
    gps = [GPRegression(np.array([[0.0]]), np.array([[1.0]]), kern_f,
                        noise_var=0.01),
           GPRegression(np.array([[0.0]]), np.array([[0.7]]), kern_g,
                        noise_var=0.02)]
    grid = linearly_spaced_combinations([(-5.0, 5.0)], 200)
    opt = SafeOpt(gps, grid, fmin=[-np.inf, 0.0], threshold=0.1)
    opt.add_new_data_point(np.array([[0.5]]), np.array([[1.2, 0.8]]))
    opt.add_new_data_point(np.array([[1.0]]), np.array([[0.9, np.nan]]))
    x1 = opt.optimize()

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(opt, path)
    opt2 = checkpoint.load(path)

    assert_allclose(opt2.x, opt.x)
    assert_allclose(opt2.y, opt.y)
    assert opt2.gps[0].num_data == opt.gps[0].num_data
    assert opt2.gps[1].num_data == opt.gps[1].num_data
    x2 = opt2.optimize()
    assert_allclose(np.asarray(x2), np.asarray(x1), atol=1e-12)
    # posteriors identical
    q = np.linspace(-5, 5, 30)[:, None]
    for g1, g2 in zip(opt.gps, opt2.gps):
        m1, v1 = g1.predict_noiseless(q)
        m2, v2 = g2.predict_noiseless(q)
        assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-12)
        assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-12)


def test_safeopt_context_roundtrip(tmp_path):
    kern = RBF(1, active_dims=[0]) * RBF(1, active_dims=[1])
    gp = GPRegression(np.array([[0.0, 0.0]]), np.array([[1.0]]), kern,
                      noise_var=0.01)
    params = linearly_spaced_combinations([(-1.0, 1.0)], 20)
    opt = SafeOpt(gp, params, fmin=[0.0], num_contexts=1)
    opt.context = 0.3

    path = str(tmp_path / "ckpt_ctx.npz")
    checkpoint.save(opt, path)
    opt2 = checkpoint.load(path)
    assert_allclose(opt2.context, [0.3])
    assert opt2.num_contexts == 1


def test_swarm_roundtrip(tmp_path):
    gp = GPRegression(np.array([[0.0], [0.4]]), np.array([[1.0], [0.8]]),
                      RBF(1, variance=2.0), noise_var=0.01)
    opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-2.0, 2.0]], swarm_size=10)
    opt.optimize()

    path = str(tmp_path / "ckpt_swarm.npz")
    checkpoint.save(opt, path)
    opt2 = checkpoint.load(path)

    assert_allclose(opt2.S, opt.S)
    assert_allclose(opt2.greedy_point, opt.greedy_point)
    assert opt2.best_lower_bound == opt.best_lower_bound
    assert opt2.swarm_size == 10
    # resumed object keeps optimizing from the restored state
    x = opt2.optimize()
    assert -2.0 <= float(x[0]) <= 2.0


def test_safeopt_settings_roundtrip(tmp_path):
    """expander_chunk / use_pallas / use_lipschitz survive a roundtrip."""
    gp = GPRegression(np.array([[0.0]]), np.array([[1.0]]),
                      RBF(1, variance=2.0), noise_var=0.01)
    grid = linearly_spaced_combinations([(-3.0, 3.0)], 100)
    opt = SafeOpt(gp, grid, fmin=[0.0], lipschitz=[1.5],
                  expander_chunk=8, use_pallas=False)
    assert opt.use_lipschitz
    opt.use_lipschitz = False   # toggle away from the constructor default

    path = str(tmp_path / "ckpt_settings.npz")
    checkpoint.save(opt, path)
    opt2 = checkpoint.load(path)
    assert opt2._expander_chunk == 8
    assert opt2._use_pallas is False
    assert opt2.use_lipschitz is False
    assert_allclose(opt2.lipschitz, [1.5])


def test_swarm_max_iters_roundtrip(tmp_path):
    gp = GPRegression(np.array([[0.0]]), np.array([[1.0]]),
                      RBF(1, variance=2.0), noise_var=0.01)
    opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-2.0, 2.0]], swarm_size=10,
                       max_iters=7)
    path = str(tmp_path / "ckpt_swarm_iters.npz")
    checkpoint.save(opt, path)
    opt2 = checkpoint.load(path)
    assert opt2.max_iters == 7


def test_callable_beta_warns(tmp_path, caplog):
    import logging

    gp = GPRegression(np.array([[0.0]]), np.array([[1.0]]),
                      RBF(1, variance=2.0), noise_var=0.01)
    grid = linearly_spaced_combinations([(-3.0, 3.0)], 50)
    opt = SafeOpt(gp, grid, fmin=[0.0], beta=lambda t: 2.0 + 0.1 * t)
    path = str(tmp_path / "ckpt_beta.npz")
    with caplog.at_level(logging.WARNING):
        checkpoint.save(opt, path)
    assert any("callable" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING):
        opt2 = checkpoint.load(path)
    assert any("callable" in r.message for r in caplog.records)
    # frozen constant equals beta(t) at save time
    assert opt2.beta(0) == opt.beta(opt.t)
    # re-supplying the schedule restores it exactly
    opt3 = checkpoint.load(path, beta=lambda t: 2.0 + 0.1 * t)
    assert opt3.beta(5) == 2.5


def test_sparse_gp_roundtrip(tmp_path):
    from safeopt_tpu.gp.sparse import SparseGPRegression

    rng = np.random.default_rng(7)
    X = rng.uniform(-2.0, 2.0, size=(30, 1))
    Y = np.exp(-0.5 * X ** 2) + 0.01 * rng.normal(size=(30, 1))
    gp = SparseGPRegression(X, Y, RBF(1, variance=2.0), noise_var=0.01,
                            inducing=8)
    opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-2.0, 2.0]], swarm_size=10)

    path = str(tmp_path / "ckpt_sparse.npz")
    checkpoint.save(opt, path)
    opt2 = checkpoint.load(path)

    assert type(opt2.gp).__name__ == "SparseGPRegression"
    assert_allclose(np.asarray(opt2.gp.Z), np.asarray(gp.Z))
    q = np.linspace(-2, 2, 20)[:, None]
    m1, v1 = gp.predict_noiseless(q)
    m2, v2 = opt2.gp.predict_noiseless(q)
    assert_allclose(np.asarray(m2), np.asarray(m1), atol=1e-10)
    assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-10)
    # identical next query point (same restored PRNG key)
    x1 = opt.optimize()
    x2 = opt2.optimize()
    assert_allclose(np.asarray(x2), np.asarray(x1), atol=1e-12)


def test_swarm_midrun_next_query_identical(tmp_path):
    gp = GPRegression(np.array([[0.0], [0.3]]), np.array([[1.0], [0.9]]),
                      RBF(1, variance=2.0), noise_var=0.01)
    opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-2.0, 2.0]], swarm_size=10,
                       max_iters=20)
    for _ in range(3):
        x = opt.optimize()
        opt.add_new_data_point(np.atleast_2d(x),
                               np.array([[float(np.exp(-0.5 * x[0] ** 2))]]))

    path = str(tmp_path / "ckpt_swarm_mid.npz")
    checkpoint.save(opt, path)
    opt2 = checkpoint.load(path)
    x1 = opt.optimize()
    x2 = opt2.optimize()
    assert_allclose(np.asarray(x2), np.asarray(x1), atol=1e-12)
