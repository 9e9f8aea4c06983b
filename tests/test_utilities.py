"""Utilities: grid construction, GP-prior sampling, plotting smoke."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest
from numpy.testing import assert_allclose

from safeopt_tpu import (linearly_spaced_combinations, plot_2d_gp,
                         plot_3d_gp, plot_contour_gp, sample_gp_function)
from safeopt_tpu.gp import GPRegression, RBF


class TestGrid:
    def test_1d(self):
        g = linearly_spaced_combinations([(-1.0, 1.0)], 5)
        assert g.shape == (5, 1)
        assert_allclose(g[:, 0], np.linspace(-1, 1, 5))

    def test_2d_meshgrid_xy_row_order(self):
        """Row order must match np.meshgrid 'xy' (reference
        utilities.py:54) — first dim varies fastest."""
        g = linearly_spaced_combinations([(0.0, 1.0), (0.0, 2.0)], [2, 3])
        expected = np.array([[0, 0], [1, 0], [0, 1], [1, 1], [0, 2], [1, 2]],
                            dtype=float)
        assert_allclose(g, expected)

    def test_per_dim_samples(self):
        g = linearly_spaced_combinations([(0, 1), (0, 1), (0, 1)], [2, 3, 4])
        assert g.shape == (24, 3)

    def test_3d_matches_meshgrid(self):
        bounds = [(0.0, 1.0), (-1.0, 0.0), (2.0, 3.0)]
        g = linearly_spaced_combinations(bounds, 3)
        axes = [np.linspace(lo, hi, 3) for lo, hi in bounds]
        mesh = np.meshgrid(*axes)
        expected = np.array([m.ravel() for m in mesh]).T
        assert_allclose(g, expected)


class TestSampleGPFunction:
    def test_kernel_interpolation_passes_through_grid(self):
        """The RKHS interpolant reproduces the draw at grid nodes."""
        import jax

        kern = RBF(1, variance=2.0)
        f = sample_gp_function(kern, [(-3.0, 3.0)], noise_var=0.01,
                               num_samples=30, key=jax.random.key(1))
        xs = np.linspace(-3, 3, 30)[:, None]
        y1 = np.asarray(f(xs, noise=False))
        y2 = np.asarray(f(xs, noise=False))
        assert y1.shape == (30, 1)
        assert_allclose(y1, y2)  # deterministic without noise

        # noisy calls differ from the clean value but stay close
        yn = np.asarray(f(xs, noise=True))
        assert not np.allclose(yn, y1)
        assert np.max(np.abs(yn - y1)) < 1.0

    def test_mean_function(self):
        import jax

        kern = RBF(1, variance=1e-10)  # essentially zero GP
        f = sample_gp_function(kern, [(-1.0, 1.0)], noise_var=0.0,
                               num_samples=10,
                               mean_function=lambda x: 3.0 * x,
                               key=jax.random.key(0))
        xs = np.array([[0.5]])
        assert_allclose(np.asarray(f(xs, noise=False)), [[1.5]], atol=1e-3)

    def test_linear_interpolation(self):
        import jax

        kern = RBF(1, variance=2.0)
        f = sample_gp_function(kern, [(-2.0, 2.0)], noise_var=0.0,
                               num_samples=20, interpolation="linear",
                               key=jax.random.key(2))
        xs = np.linspace(-2, 2, 7)[:, None]
        y = np.asarray(f(xs, noise=False))
        assert y.shape == (7, 1)
        assert np.all(np.isfinite(y))

    def test_smoothness_statistics(self):
        """A draw from a smooth prior has bounded increments."""
        import jax

        kern = RBF(1, variance=1.0, lengthscale=1.0)
        f = sample_gp_function(kern, [(-5.0, 5.0)], noise_var=0.0,
                               num_samples=100, key=jax.random.key(7))
        xs = np.linspace(-5, 5, 200)[:, None]
        y = np.asarray(f(xs, noise=False))[:, 0]
        assert np.max(np.abs(np.diff(y))) < 1.0
        assert np.std(y) < 4.0

    def test_bad_interpolation_mode(self):
        with pytest.raises(ValueError):
            sample_gp_function(RBF(1), [(-1, 1)], 0.1, 5,
                               interpolation="cubic")


class TestPlotting:
    def test_plot_2d_gp(self):
        gp = GPRegression(np.array([[0.0], [1.0]]), np.array([[1.0], [2.0]]),
                          RBF(1), noise_var=0.01)
        inputs = np.linspace(-1, 2, 20)[:, None]
        axis = plot_2d_gp(gp, inputs, fmin=0.0)
        assert axis is not None

    def test_plot_3d_gp(self):
        gp = GPRegression(np.array([[0.0, 0.0], [1.0, 1.0]]),
                          np.array([[1.0], [2.0]]), RBF(2), noise_var=0.01)
        grid = linearly_spaced_combinations([(-1, 1), (-1, 1)], 5)
        surf, data = plot_3d_gp(gp, grid)
        assert surf is not None

    def test_plot_contour_gp(self):
        gp = GPRegression(np.array([[0.0, 0.0], [1.0, 1.0]]),
                          np.array([[1.0], [2.0]]), RBF(2), noise_var=0.01)
        inputs = [np.linspace(-1, 1, 5), np.linspace(-1, 1, 6)]
        c, cbar, data = plot_contour_gp(gp, inputs)
        assert data is not None

    def test_plot_via_optimizer(self):
        from safeopt_tpu import SafeOpt

        gp = GPRegression(np.array([[0.0]]), np.array([[1.0]]),
                          RBF(1, variance=2.0), noise_var=0.01)
        grid = linearly_spaced_combinations([(-2.0, 2.0)], 30)
        opt = SafeOpt(gp, grid, fmin=[0.0])
        opt.plot(n_samples=20)


def test_plot_with_contexts():
    from safeopt_tpu import SafeOpt
    from safeopt_tpu.gp import Product

    kern = RBF(1, active_dims=[0]) * RBF(1, active_dims=[1])
    gp = GPRegression(np.array([[0.0, 0.0]]), np.array([[1.0]]), kern,
                      noise_var=0.01)
    params = linearly_spaced_combinations([(-1.0, 1.0)], 15)
    opt = SafeOpt(gp, params, fmin=[0.0], num_contexts=1)
    opt.context = 0.25
    opt.plot(n_samples=10)   # pins the context via context_fixed_inputs


class TestSampleGPFunctionStatistics:
    """Round-2 additions: f64 draw hygiene (VERDICT item 6)."""

    def test_sample_covariance_matches_prior(self):
        """The empirical covariance of repeated prior draws converges
        to K + jitter*I (reference draw: np.random.multivariate_normal,
        utilities.py:88-91)."""
        import jax
        from scipy.spatial.distance import cdist

        kern = RBF(1, variance=2.0, lengthscale=1.0)
        bounds = [(-2.0, 2.0)]
        n_grid = 12
        grid = linearly_spaced_combinations(bounds, n_grid)

        draws = []
        n_draws = 600
        for i in range(n_draws):
            f = sample_gp_function(kern, bounds, noise_var=0.0,
                                   num_samples=n_grid,
                                   key=jax.random.key(1000 + i))
            draws.append(np.asarray(f(grid, noise=False))[:, 0])
        draws = np.stack(draws)

        emp = (draws.T @ draws) / n_draws        # zero-mean prior
        expected = 2.0 * np.exp(-0.5 * cdist(grid, grid, "sqeuclidean"))
        # MC error ~ sqrt(2/n)*var ~ 0.12; keep a safe margin
        assert np.max(np.abs(emp - expected)) < 0.35
        assert np.abs(np.mean(draws)) < 0.05

    def test_draw_matches_scipy_only_reconstruction(self):
        """Cross-check the returned interpolant against an independent
        scipy-only reconstruction: chol(K + jitter I) @ normal, grams by
        cdist, solve by scipy — no repo math involved."""
        import jax
        import jax.numpy as jnp
        import scipy.linalg
        from scipy.spatial.distance import cdist

        from safeopt_tpu.config import JITTER

        kern = RBF(1, variance=1.5, lengthscale=0.8)
        bounds = [(-1.0, 1.0)]
        n_grid = 25
        key = jax.random.key(42)
        f = sample_gp_function(kern, bounds, noise_var=0.0,
                               num_samples=n_grid, key=key)

        grid = linearly_spaced_combinations(bounds, n_grid)
        # replicate the function's own key handling and f64 draw
        _, draw_key = jax.random.split(jax.random.key(42))
        with jax.enable_x64(True):
            normal = np.asarray(jax.random.normal(draw_key, (n_grid,),
                                                  dtype=jnp.float64))
        assert normal.dtype == np.float64

        K = 1.5 * np.exp(-0.5 * cdist(grid / 0.8, grid / 0.8,
                                      "sqeuclidean"))
        cov = K + JITTER * np.eye(n_grid)
        chol = scipy.linalg.cholesky(cov, lower=True)
        path = chol @ normal
        # the closure evaluates the RKHS interpolant K(x, grid) @
        # cov^-1 path (reference utilities.py:120-143)
        expected = K @ scipy.linalg.cho_solve((chol, True), path)
        got = np.asarray(f(grid, noise=False))[:, 0]
        np.testing.assert_allclose(got, expected, atol=1e-8)
        # and the interpolant passes near the raw path (jitter-limited)
        np.testing.assert_allclose(got, path, atol=5e-2)

    def test_noise_stream_is_deterministic_per_call_index(self):
        import jax

        kern = RBF(1, variance=1.0)
        bounds = [(-1.0, 1.0)]

        def two_calls():
            f = sample_gp_function(kern, bounds, noise_var=0.1,
                                   num_samples=10, key=jax.random.key(3))
            x = np.zeros((4, 1))
            return np.asarray(f(x)), np.asarray(f(x))

        a1, a2 = two_calls()
        b1, b2 = two_calls()
        np.testing.assert_array_equal(a1, b1)   # call 0 reproducible
        np.testing.assert_array_equal(a2, b2)   # call 1 reproducible
        assert not np.array_equal(a1, a2)       # stream advances
        # explicit key overrides the internal stream
        f = sample_gp_function(kern, bounds, noise_var=0.1, num_samples=10,
                               key=jax.random.key(3))
        k = jax.random.key(9)
        e1 = np.asarray(f(np.zeros((4, 1)), key=k))
        e2 = np.asarray(f(np.zeros((4, 1)), key=k))
        np.testing.assert_array_equal(e1, e2)
