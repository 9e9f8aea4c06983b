"""Property-based invariants of the GP engine and SafeOpt classification.

These complement the golden-parity tests: they check mathematical
identities that must hold for any correct implementation (SURVEY.md
section 4's recommended property tests).
"""

import numpy as np
from numpy.testing import assert_allclose

from safeopt_tpu import SafeOpt, linearly_spaced_combinations
from safeopt_tpu.gp import GPRegression, RBF


RNG = np.random.default_rng(7)


class TestGPAnalytic:
    def test_single_point_posterior_closed_form(self):
        """One observation: posterior has the textbook closed form.

        mu(z) = k(z,x0) y0 / (k(x0,x0) + s2)
        var(z) = k(z,z) - k(z,x0)^2 / (k(x0,x0) + s2)
        """
        var0, ls, s2, y0 = 2.0, 0.7, 0.05, 1.3
        gp = GPRegression(np.array([[0.4]]), np.array([[y0]]),
                          RBF(1, variance=var0, lengthscale=ls),
                          noise_var=s2)
        z = np.linspace(-2, 2, 17)[:, None]
        mu, var = gp.predict_noiseless(z)

        k = var0 * np.exp(-0.5 * ((z - 0.4) / ls) ** 2)
        denom = var0 + s2
        assert_allclose(np.asarray(mu), k * y0 / denom, rtol=1e-10)
        assert_allclose(np.asarray(var), var0 - k ** 2 / denom, rtol=1e-10)

    def test_posterior_variance_decreases_with_data(self):
        """Adding observations can only tighten the posterior."""
        gp = GPRegression(np.array([[0.0]]), np.array([[1.0]]),
                          RBF(1, variance=2.0), noise_var=0.01)
        z = np.linspace(-3, 3, 31)[:, None]
        _, var1 = gp.predict_noiseless(z)
        gp.append_data(np.array([1.0]), 0.5)
        gp.append_data(np.array([-1.0]), 0.8)
        _, var2 = gp.predict_noiseless(z)
        assert np.all(np.asarray(var2) <= np.asarray(var1) + 1e-12)

    def test_interpolation_at_training_points(self):
        """With small noise the posterior mean interpolates the data.

        Points are well separated (the gram of clustered points with
        near-zero noise is too ill-conditioned for any finite-precision
        interpolation claim).
        """
        X = np.linspace(-2, 2, 6)[:, None]
        Y = RNG.normal(size=(6, 1))
        gp = GPRegression(X, Y, RBF(1, variance=2.0, lengthscale=0.5),
                          noise_var=1e-8)
        mu, var = gp.predict_noiseless(X)
        assert_allclose(np.asarray(mu), Y, atol=1e-5)
        assert np.all(np.asarray(var) < 1e-5)


def _make_opt(beta):
    kern = RBF(1, variance=2.0)
    gp = GPRegression(np.array([[0.0], [0.6], [-0.8]]),
                      np.array([[1.2], [0.9], [0.7]]), kern,
                      noise_var=0.01)
    grid = linearly_spaced_combinations([(-5.0, 5.0)], 300)
    return SafeOpt(gp, grid, fmin=[0.0], beta=beta, threshold=0.05)


class TestSafeOptInvariants:
    def test_safe_set_shrinks_with_beta(self):
        """Larger beta -> wider intervals -> smaller (nested) safe set."""
        sizes = {}
        masks = {}
        for beta in (1.0, 2.0, 4.0):
            opt = _make_opt(beta)
            opt.optimize()
            masks[beta] = opt.S.copy()
            sizes[beta] = int(opt.S.sum())
        assert sizes[1.0] >= sizes[2.0] >= sizes[4.0] > 0
        # nesting, not just cardinality
        assert np.all(masks[4.0] <= masks[2.0])
        assert np.all(masks[2.0] <= masks[1.0])

    def test_sets_are_disjoint_and_inside_safe(self):
        opt = _make_opt(2.0)
        opt.optimize()
        assert np.all(opt.M <= opt.S)
        assert np.all(opt.G <= opt.S)
        assert not np.any(opt.M & opt.G)  # expanders filtered out of M

    def test_query_is_in_m_union_g(self):
        opt = _make_opt(2.0)
        x = opt.optimize()
        idx = int(np.argmin(np.abs(opt.inputs[:, 0] - x[0])))
        assert opt.M[idx] or opt.G[idx]

    def test_full_sets_superset_of_fast_expanders(self):
        """compute_sets(full_sets=True) evaluates every safe point; the
        fast path's single expander must be among them."""
        opt = _make_opt(2.0)
        opt.optimize()
        g_fast = opt.G.copy()
        opt.compute_sets(full_sets=True)
        g_full = opt.G.copy()
        if g_fast.any():
            assert g_full[np.flatnonzero(g_fast)[0]]
        # full-mode candidates include maximizers too
        assert g_full.sum() >= g_fast.sum()

    def test_get_maximum_is_safe(self):
        opt = _make_opt(2.0)
        x, lb = opt.get_maximum()
        idx = int(np.argmin(np.abs(opt.inputs[:, 0] - x[0])))
        assert opt.S[idx]
        assert lb <= np.max(opt.Q[opt.S, 0]) + 1e-12
