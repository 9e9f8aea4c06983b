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
