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


def test_safeopt_oracle_roundtrip(tmp_path):
    """The resolved f64-oracle placement survives a roundtrip (a
    checkpoint saved on an accelerator session restores its 'device'
    choice verbatim rather than re-resolving 'auto' on the loading
    backend)."""
    gp = GPRegression(np.array([[0.0]]), np.array([[1.0]]),
                      RBF(1, variance=2.0), noise_var=0.01)
    grid = linearly_spaced_combinations([(-3.0, 3.0)], 50)
    opt = SafeOpt(gp, grid, fmin=[0.0], exact_boundaries=True,
                  oracle="device", use_pallas=False)
    path = str(tmp_path / "ckpt_oracle.npz")
    checkpoint.save(opt, path)
    opt2 = checkpoint.load(path)
    assert opt2._oracle == "device"
    assert opt2._exact_boundaries is True


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


# ---------------------------------------------------------------------------
# device loop-state persistence (VERDICT r2 weak #8: campaign resume)
# ---------------------------------------------------------------------------


class TestCampaignPersistence:
    def _problem(self):
        import jax.numpy as jnp

        from safeopt_tpu import linearly_spaced_combinations
        from safeopt_tpu.gp import GPRegression, RBF

        x0 = np.array([[0.1, -0.1]])
        y0 = 2.0 * np.exp(-0.5 * np.sum(x0 ** 2))
        gp = GPRegression(x0, np.array([[y0]]),
                          RBF(2, variance=2.0, lengthscale=1.2),
                          noise_var=1e-4, capacity=32)
        grid = jnp.asarray(np.asarray(linearly_spaced_combinations(
            [(-2.0, 2.0), (-2.0, 2.0)], 30)))
        dtype = gp.state.X.dtype
        args = dict(kernels=(gp.kern,), grid=grid,
                    fmin=jnp.asarray([0.5], dtype),
                    beta=jnp.asarray(2.0, dtype),
                    scaling=jnp.asarray([np.sqrt(2.0)], dtype),
                    threshold=jnp.asarray([0.0], dtype))

        def objective(x):
            return 2.0 * jnp.exp(-0.5 * jnp.sum(x * x))

        return gp, args, objective

    def test_safeopt_loop_resumes_bit_identically(self, tmp_path):
        import jax

        from safeopt_tpu.algorithms.runner import run_safeopt_loop
        from safeopt_tpu.utils.checkpoint import load_state, save_state

        gp, a, objective = self._problem()
        keys = jax.random.split(jax.random.key(42), 10)
        common = dict(objectives=(objective,), noise_std=0.05, chunk=16)

        full = run_safeopt_loop(a["kernels"], (gp.state,), a["grid"],
                                a["fmin"], a["beta"], a["scaling"],
                                a["threshold"], keys[0], n_iter=10,
                                it_keys=keys, **common)

        head = run_safeopt_loop(a["kernels"], (gp.state,), a["grid"],
                                a["fmin"], a["beta"], a["scaling"],
                                a["threshold"], keys[0], n_iter=6,
                                it_keys=keys[:6], **common)
        # die mid-campaign: persist states + remaining keys + cursor
        path = str(tmp_path / "campaign.npz")
        save_state(path, {"states": head.states, "it_keys": keys[6:],
                          "t": 6})
        ck = load_state(path)
        assert ck["t"] == 6
        tail = run_safeopt_loop(a["kernels"], tuple(ck["states"]),
                                a["grid"], a["fmin"], a["beta"],
                                a["scaling"], a["threshold"], keys[0],
                                n_iter=4, it_keys=ck["it_keys"], **common)

        np.testing.assert_array_equal(
            np.vstack([np.asarray(head.xs), np.asarray(tail.xs)]),
            np.asarray(full.xs))
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(head.next_idx),
                            np.asarray(tail.next_idx)]),
            np.asarray(full.next_idx))
        for sf, st in zip(full.states, tail.states):
            np.testing.assert_array_equal(np.asarray(sf.X),
                                          np.asarray(st.X))
            assert int(sf.count) == int(st.count)

    def test_swarm_loop_resumes_bit_identically(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from safeopt_tpu.algorithms.runner import run_swarmopt_loop
        from safeopt_tpu.algorithms.swarm_opt_fused import SwarmIterState
        from safeopt_tpu.gp import GPRegression, RBF
        from safeopt_tpu.utils.checkpoint import load_state, save_state

        d = 2
        x0 = np.zeros((1, d))
        gp = GPRegression(x0, np.array([[2.0]]),
                          RBF(d, variance=2.0, lengthscale=1.5),
                          noise_var=1e-4, capacity=32)
        dtype = gp.state.X.dtype

        def f(x):
            return 2.0 * jnp.exp(-0.5 * jnp.sum(x * x))

        S_buf = np.zeros((128, d))
        sstate = SwarmIterState(S=jnp.asarray(S_buf, dtype),
                                count=jnp.asarray(1, jnp.int32),
                                greedy=jnp.asarray(x0[0], dtype))
        keys = jax.random.split(jax.random.key(3), 8)
        fixed = ((gp.kern,), jnp.asarray([0.3, 0.3], dtype),
                 jnp.asarray([[-3.0, 3.0]] * d, dtype),
                 jnp.asarray([0.0], dtype),
                 jnp.asarray([np.sqrt(2.0)], dtype),
                 jnp.asarray([0.0], dtype))
        common = dict(objectives=(f,), swarm_size=8, max_iters=8,
                      noise_std=0.02)

        def run(states, sstate, it_keys, betas, greedy0, blb0):
            kernels, vel, bounds, fmin, scaling, thr = fixed
            return run_swarmopt_loop(
                kernels, states, sstate, it_keys[0], vel, bounds, fmin,
                scaling, thr, betas, greedy0, blb0,
                n_iter=len(betas), it_keys=it_keys, **common)

        betas = np.full(8, 2.0)
        full = run((gp.state,), sstate, keys, betas,
                   jnp.asarray(x0[0], dtype),
                   jnp.asarray(-jnp.inf, dtype))

        head = run((gp.state,), sstate, keys[:5], betas[:5],
                   jnp.asarray(x0[0], dtype),
                   jnp.asarray(-jnp.inf, dtype))
        path = str(tmp_path / "swarm.npz")
        save_state(path, {
            "states": head.states, "iter_state": head.iter_state,
            "it_keys": keys[5:], "t": 5,
            "greedy": head.iter_state.greedy,
            "blb": np.asarray(head.best_lower_bounds)[-1]})
        ck = load_state(path)
        tail = run(tuple(ck["states"]), ck["iter_state"], ck["it_keys"],
                   betas[5:], ck["greedy"], ck["blb"])

        np.testing.assert_array_equal(
            np.vstack([np.asarray(head.xs), np.asarray(tail.xs)]),
            np.asarray(full.xs))
        np.testing.assert_array_equal(
            np.asarray(tail.iter_state.S),
            np.asarray(full.iter_state.S))

    def test_fleet_resumes_bit_identically(self, tmp_path):
        """A vmapped (batched) fleet round-trips through save_state with
        its leading campaign axis intact."""
        import jax
        import jax.numpy as jnp

        from safeopt_tpu.parallel import (run_safeopt_campaigns,
                                          stack_campaign_states)
        from safeopt_tpu.utils.checkpoint import load_state, save_state

        gp, a, objective = self._problem()
        K = 4
        rng = np.random.default_rng(0)
        from safeopt_tpu.gp import GPRegression, RBF
        per = []
        for _ in range(K):
            x0 = rng.uniform(-0.3, 0.3, size=(1, 2))
            y0 = 2.0 * np.exp(-0.5 * np.sum(x0 ** 2))
            g = GPRegression(x0, np.array([[y0]]), gp.kern,
                             noise_var=1e-4, capacity=32)
            per.append((g.state,))
        batched = stack_campaign_states(per)
        keys = jax.random.split(jax.random.key(9), K)
        common = dict(objectives=(objective,), chunk=16)

        path = str(tmp_path / "fleet.npz")
        # per-campaign iteration keys: the loop splits its key per
        # iteration, so resume must replay the SAME per-iter key tail
        it_keys = jnp.stack([jax.random.split(k, 6) for k in keys])
        fullk = run_safeopt_campaigns(
            a["kernels"], batched, a["grid"], a["fmin"], a["beta"],
            a["scaling"], a["threshold"], keys, n_iter=6,
            it_keys=it_keys, **common)
        headk = run_safeopt_campaigns(
            a["kernels"], batched, a["grid"], a["fmin"], a["beta"],
            a["scaling"], a["threshold"], keys, n_iter=3,
            it_keys=it_keys[:, :3], **common)
        save_state(path, {"states": headk.states, "it_keys": it_keys,
                          "t": 3})
        ck = load_state(path)
        tailk = run_safeopt_campaigns(
            a["kernels"], tuple(ck["states"]), a["grid"], a["fmin"],
            a["beta"], a["scaling"], a["threshold"], keys, n_iter=3,
            it_keys=jnp.asarray(ck["it_keys"])[:, 3:], **common)
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(headk.xs), np.asarray(tailk.xs)],
                           axis=1),
            np.asarray(fullk.xs))
