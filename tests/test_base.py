"""Base-class behaviors, mirroring the reference unit tests
(/root/reference/safeopt/tests/test_gps.py): beta handling, auto
scaling, scaling validation, NaN-aware data routing, and context column
stacking."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from safeopt_tpu import GaussianProcessOptimization
from safeopt_tpu.gp import GPRegression, Matern32, RBF


@pytest.fixture
def gps():
    gp1 = GPRegression(np.array([[0.0]]), np.array([[0.0]]),
                       RBF(1, variance=2.0))
    gp2 = GPRegression(np.array([[0.0]]), np.array([[0.0]]),
                       Matern32(1, variance=4.0))
    return gp1, gp2


class TestInit:
    def test_beta_constant(self, gps):
        gp1, _ = gps
        opt = GaussianProcessOptimization(gp1, fmin=0, beta=2,
                                          num_contexts=1, threshold=0,
                                          scaling="auto")
        assert opt.beta(0) == 2

    def test_beta_callable(self, gps):
        gp1, _ = gps
        opt = GaussianProcessOptimization(gp1, fmin=[0], beta=lambda t: 5,
                                          num_contexts=1, threshold=0,
                                          scaling="auto")
        assert opt.beta(10) == 5

    def test_auto_scaling_multi_gp(self, gps):
        gp1, gp2 = gps
        opt = GaussianProcessOptimization([gp1, gp2], fmin=0, beta=2,
                                          num_contexts=1, threshold=0,
                                          scaling="auto")
        assert_allclose(opt.scaling, np.array([np.sqrt(2), np.sqrt(4)]))

    def test_scaling_validation(self, gps):
        gp1, gp2 = gps
        with pytest.raises(ValueError):
            GaussianProcessOptimization([gp1, gp2], 2, scaling=[5])

    def test_explicit_scaling(self, gps):
        gp1, gp2 = gps
        opt = GaussianProcessOptimization([gp1, gp2], fmin=[1, 0], beta=2,
                                          num_contexts=1, threshold=0,
                                          scaling=[1, 2])
        assert_allclose(opt.scaling, np.array([1, 2]))

    def test_fmin_broadcast(self, gps):
        gp1, gp2 = gps
        opt = GaussianProcessOptimization([gp1, gp2], fmin=0)
        assert_allclose(opt.fmin, np.array([0.0, 0.0]))

    def test_mismatched_initial_data_raises(self):
        gp1 = GPRegression(np.array([[0.0]]), np.array([[0.0]]), RBF(1))
        gp2 = GPRegression(np.array([[1.0]]), np.array([[0.0]]), RBF(1))
        with pytest.raises(NotImplementedError):
            GaussianProcessOptimization([gp1, gp2], fmin=0)


class TestDataHandling:
    def test_add_1d(self, gps):
        gp1, _ = gps
        gp1.set_XY(np.array([[0.0]]), np.array([[1.0]]))
        opt = GaussianProcessOptimization(gp1, 0)
        opt.add_new_data_point(2, 3)
        x, y = opt.data
        assert_allclose(x, np.array([[0], [2]]))
        assert_allclose(y, np.array([[1], [3]]))
        assert opt.t == 2

    def test_add_multi_gp(self, gps):
        gp1, gp2 = gps
        gp1.set_XY(np.array([[0.0]]), np.array([[1.0]]))
        gp2.set_XY(np.array([[0.0]]), np.array([[11.0]]))
        opt = GaussianProcessOptimization([gp1, gp2], [0, 1])
        opt.add_new_data_point(2, [2, 3])
        x, y = opt.data
        assert_allclose(x, np.array([[0], [2]]))
        assert_allclose(y, np.array([[1, 11], [2, 3]]))

    def test_nan_routing_and_removal(self, gps):
        gp1, gp2 = gps
        gp1.set_XY(np.array([[0.0]]), np.array([[1.0]]))
        gp2.set_XY(np.array([[0.0]]), np.array([[11.0]]))
        opt = GaussianProcessOptimization([gp1, gp2], [0, 1])
        opt.add_new_data_point(2, [2, 3])
        opt.add_new_data_point(3, [2, np.nan])

        assert_allclose(opt.x, np.array([[0], [2], [3]]))
        assert_allclose(opt.y, np.array([[1, 11], [2, 3], [2, np.nan]]))
        for i, gp in enumerate(opt.gps):
            not_nan = ~np.isnan(opt.y[:, i])
            assert_allclose(np.asarray(gp.X), opt.x[not_nan, :])
            assert_allclose(np.asarray(gp.Y)[:, 0], opt.y[not_nan, i])

        opt.remove_last_data_point()
        assert_allclose(opt.x, np.array([[0], [2]]))
        assert_allclose(opt.y, np.array([[1, 11], [2, 3]]))
        for i, gp in enumerate(opt.gps):
            not_nan = ~np.isnan(opt.y[:, i])
            assert_allclose(np.asarray(gp.X), opt.x[not_nan, :])
            assert_allclose(np.asarray(gp.Y)[:, 0], opt.y[not_nan, i])

    def test_contexts(self):
        gp1 = GPRegression(np.array([[0.0, 0.0]]), np.array([[5.0]]),
                           RBF(2, variance=2.0))
        gp2 = GPRegression(np.array([[0.0, 0.0]]), np.array([[6.0]]),
                           Matern32(2, variance=4.0))
        opt = GaussianProcessOptimization([gp1, gp2], fmin=[0, 0],
                                          num_contexts=1)
        opt.add_new_data_point(1, [3, 4], context=2)
        assert_allclose(opt.x, np.array([[0, 0], [1, 2]]))
        assert_allclose(opt.y, np.array([[5, 6], [3, 4]]))
        for i, gp in enumerate(opt.gps):
            assert_allclose(np.asarray(gp.X), opt.x)
            assert_allclose(np.asarray(gp.Y)[:, 0], opt.y[:, i])

    def test_virtual_point_roundtrip(self, gps):
        """_add_data_point/_remove_last_data_point leave the global
        store untouched (used by the expander test)."""
        gp1, _ = gps
        gp1.set_XY(np.array([[0.0]]), np.array([[1.0]]))
        opt = GaussianProcessOptimization(gp1, 0)
        opt._add_data_point(gp1, np.array([[1.0]]), np.array([[2.0]]))
        assert gp1.num_data == 2
        assert opt.t == 1
        opt._remove_last_data_point(gp1)
        assert gp1.num_data == 1
