"""On-device BO loop vs the host-driven class loop: identical decisions."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from safeopt_tpu import SafeOpt, linearly_spaced_combinations
from safeopt_tpu.algorithms.runner import run_safeopt_loop
from safeopt_tpu.gp import GPRegression, RBF


def _objective_closure(kern_np_centers, weights):
    centers = jnp.asarray(kern_np_centers, dtype=float)
    weights = jnp.asarray(weights, dtype=float)

    def f(x):
        r2 = jnp.sum((x[None, :] - centers) ** 2, axis=1)
        return 2.0 * jnp.exp(-0.5 * r2) @ weights

    return f


def test_on_device_loop_matches_host_loop():
    centers = [[-3.0], [0.0], [2.5]]
    weights = [0.6, 1.0, -0.7]
    f_dev = _objective_closure(centers, weights)

    def f_host(x):
        return float(f_dev(jnp.asarray(np.atleast_1d(x), dtype=float)))

    x0 = np.array([[0.0]])
    y0 = np.array([[f_host(np.array([0.0]))]])
    assert y0[0, 0] > 0.5

    grid = linearly_spaced_combinations([(-6.0, 6.0)], 200)
    n_iter = 8

    # host loop (noise-free so both loops see the same observations)
    gp_h = GPRegression(x0, y0, RBF(1, variance=2.0), noise_var=1e-4,
                        capacity=64)
    opt = SafeOpt(gp_h, grid, fmin=[0.0], threshold=0.1)
    xs_host = []
    for _ in range(n_iter):
        x = np.asarray(opt.optimize())
        xs_host.append(x.copy())
        opt.add_new_data_point(x, f_host(x))

    # device loop
    gp_d = GPRegression(x0, y0, RBF(1, variance=2.0), noise_var=1e-4,
                        capacity=64)
    dtype = gp_d.state.X.dtype
    result = run_safeopt_loop(
        (gp_d.kern,), (gp_d.state,), jnp.asarray(grid, dtype),
        jnp.asarray([0.0], dtype), jnp.asarray(2.0, dtype),
        jnp.asarray([np.sqrt(2.0)], dtype), jnp.asarray([0.1], dtype),
        jax.random.key(0), objectives=(f_dev,), n_iter=n_iter,
        noise_std=0.0, chunk=16)

    assert bool(result.has_safe.all())
    assert_allclose(np.asarray(result.xs)[:, 0],
                    np.asarray(xs_host)[:, 0], atol=1e-8)
    assert int(result.states[0].count) == 1 + n_iter
    # observations recorded correctly
    for i in range(n_iter):
        assert_allclose(float(result.ys[i, 0]),
                        f_host(np.asarray(result.xs[i])), rtol=1e-6)


def test_loop_reports_lost_certification():
    """A hostile objective that breaks safety shows up in has_safe."""
    def f_dev(x):
        return -5.0 * jnp.ones(())   # everything measured unsafe

    gp = GPRegression(np.array([[0.0]]), np.array([[1.0]]),
                      RBF(1, variance=2.0), noise_var=1e-4, capacity=64)
    grid = linearly_spaced_combinations([(-2.0, 2.0)], 50)
    dtype = gp.state.X.dtype
    result = run_safeopt_loop(
        (gp.kern,), (gp.state,), jnp.asarray(grid, dtype),
        jnp.asarray([0.0], dtype), jnp.asarray(2.0, dtype),
        jnp.asarray([np.sqrt(2.0)], dtype), jnp.asarray([0.0], dtype),
        jax.random.key(0), objectives=(f_dev,), n_iter=6, chunk=16)
    flags = np.asarray(result.has_safe)
    assert flags[0]            # starts certified
    assert not flags[-1]       # certification lost after bad data


class TestSwarmLoop:
    def test_on_device_swarm_campaign(self):
        """Five SafeOptSwarm iterations under one lax.scan: model grows,
        safety is never lost, queries stay in bounds, observations
        match the objective."""
        import jax
        import jax.numpy as jnp

        from safeopt_tpu.algorithms.runner import run_swarmopt_loop
        from safeopt_tpu.algorithms.swarm_opt_fused import SwarmIterState
        from safeopt_tpu.gp import GPRegression, RBF

        d = 2
        x0 = np.zeros((1, d))
        kern = RBF(d, variance=2.0, lengthscale=1.5)
        gp = GPRegression(x0, np.array([[2.0]]), kern, noise_var=1e-4,
                          capacity=16)
        dtype = gp.state.X.dtype

        def f(x):
            return 2.0 * jnp.exp(-0.5 * jnp.sum(x * x))

        n_iter = 5
        swarm_size = 8
        cap = 128
        S_buf = np.zeros((cap, d))
        S_buf[0] = x0[0]
        iter_state = SwarmIterState(
            S=jnp.asarray(S_buf, dtype),
            count=jnp.asarray(1, jnp.int32),
            greedy=jnp.asarray(x0[0], dtype))

        vel = jnp.asarray([0.3, 0.3], dtype)
        bounds = jnp.asarray([[-3.0, 3.0], [-3.0, 3.0]], dtype)
        res = run_swarmopt_loop(
            (kern,), (gp.state,), iter_state, jax.random.key(0), vel,
            bounds, jnp.asarray([0.0], dtype), jnp.asarray([np.sqrt(2.0)],
            dtype), jnp.asarray([0.0], dtype),
            np.full(n_iter, 2.0), x0[0], -np.inf,
            objectives=(f,), n_iter=n_iter, swarm_size=swarm_size,
            max_iters=10, noise_std=0.0)

        xs = np.asarray(res.xs)
        ys = np.asarray(res.ys)
        assert xs.shape == (n_iter, d) and np.isfinite(xs).all()
        assert (xs >= -3.0).all() and (xs <= 3.0).all()
        # observations really are f(x)
        expected = 2.0 * np.exp(-0.5 * np.sum(xs ** 2, axis=1))
        np.testing.assert_allclose(ys[:, 0], expected, rtol=1e-10)
        # model grew by one observation per iteration
        assert int(res.states[0].count) == 1 + n_iter
        # certification never lost; safe set grew
        assert (np.asarray(res.num_safe_min) > 0).all()
        assert int(np.asarray(res.safe_counts)[-1]) >= 1
        assert np.isfinite(np.asarray(res.best_lower_bounds)).all()


def test_on_device_contextual_loop_matches_host_loop():
    """Contexts + a beta schedule inside the compiled loop (round 2):
    the on-device campaign reproduces the host-driven SafeOpt loop with
    the same context switches and beta(t) exactly."""
    import jax
    import jax.numpy as jnp

    from safeopt_tpu import SafeOpt, linearly_spaced_combinations
    from safeopt_tpu.algorithms.runner import run_safeopt_loop
    from safeopt_tpu.gp import GPRegression, RBF

    kern = (RBF(1, variance=2.0, lengthscale=0.8, active_dims=[0])
            * RBF(1, variance=1.0, lengthscale=1.2, active_dims=[1]))

    def f(x):
        # objective over (param, context) — full input, like the
        # reference's driver loop
        return 2.0 * jnp.exp(-0.5 * (x[0] ** 2)) * (1.0 + 0.3 * x[1])

    x0 = np.array([[0.0, 0.0]])
    y0 = float(f(jnp.asarray(x0[0])))
    n_iter = 6
    contexts = np.array([[0.0], [0.0], [0.1], [0.1], [0.2], [0.2]])
    betas = 2.0 + 0.1 * np.arange(n_iter)

    param_grid = linearly_spaced_combinations([(-2.0, 2.0)], 41)

    # host loop: the reference-shaped driver with per-round context
    gp_h = GPRegression(x0, np.array([[y0]]), kern.copy(), noise_var=1e-4,
                        capacity=16)
    opt = SafeOpt(gp_h, np.asarray(param_grid), fmin=[0.5],
                  beta=lambda t: 2.0 + 0.1 * (t - 1), num_contexts=1)
    host_xs = []
    for t in range(n_iter):
        x = np.asarray(opt.optimize(context=contexts[t]))
        full = np.concatenate([x, contexts[t]])
        y = float(f(jnp.asarray(full)))
        host_xs.append(full)
        opt.add_new_data_point(x, np.array([[y]]), context=contexts[t])

    # on-device loop: context columns switched inside the scan
    gp_d = GPRegression(x0, np.array([[y0]]), kern.copy(), noise_var=1e-4,
                        capacity=16)
    grid = np.hstack([param_grid, np.zeros((param_grid.shape[0], 1))])
    dtype = gp_d.state.X.dtype
    res = run_safeopt_loop(
        (gp_d.kern,), (gp_d.state,), jnp.asarray(grid, dtype),
        jnp.asarray([0.5], dtype), jnp.asarray(2.0, dtype),
        jnp.asarray([np.sqrt(2.0)], dtype), jnp.asarray([0.0], dtype),
        jax.random.key(0), objectives=(f,), n_iter=n_iter, chunk=16,
        contexts=jnp.asarray(contexts, dtype),
        betas=jnp.asarray(betas, dtype))

    assert bool(np.asarray(res.has_safe).all())
    np.testing.assert_allclose(np.asarray(res.xs), np.stack(host_xs),
                               atol=1e-9)
