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
