"""Pallas fused-posterior kernel vs the XLA reference path.

Runs in interpret mode on the CPU test mesh; the same kernel compiles
through Mosaic on real TPUs.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from safeopt_tpu.gp import GPRegression, Matern32, RBF
from safeopt_tpu.gp.regression import gp_predict
from safeopt_tpu.ops import fused_intervals, supports_kernel

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("kern_cls,kw", [
    (RBF, dict(variance=2.0, lengthscale=0.8)),
    (RBF, dict(variance=1.5, lengthscale=[0.5, 1.5], ARD=True)),
    (Matern32, dict(variance=3.0, lengthscale=1.2)),
])
def test_fused_matches_xla(kern_cls, kw):
    d = 2
    kern = kern_cls(d, **kw)
    X = RNG.uniform(-2, 2, size=(10, d))
    Y = RNG.normal(size=(10, 1))
    gp = GPRegression(X, Y, kern, noise_var=0.01)

    grid = RNG.uniform(-3, 3, size=(300, d))
    beta = 2.0
    l, u = fused_intervals(kern, gp.state, np.asarray(grid, float), beta,
                           block=128)
    mu, var = gp_predict(kern, gp.state, grid)
    l_ref = np.asarray(mu) - beta * np.sqrt(np.asarray(var))
    u_ref = np.asarray(mu) + beta * np.sqrt(np.asarray(var))
    assert_allclose(np.asarray(l), l_ref, rtol=1e-9, atol=1e-10)
    assert_allclose(np.asarray(u), u_ref, rtol=1e-9, atol=1e-10)


def test_supports_kernel():
    assert supports_kernel(RBF(2))
    assert supports_kernel(Matern32(1))
    # round 2: active_dims subsets and stationary products run fused too
    assert supports_kernel(RBF(1, active_dims=[1]))
    assert supports_kernel(RBF(1, active_dims=[0]) *
                           RBF(1, active_dims=[1]))
    assert supports_kernel(RBF(1, active_dims=[0]) * Matern32(2))


@pytest.mark.parametrize("make_kern", [
    # the reference's contextual kernel shape (context_example notebook)
    lambda: RBF(1, variance=2.0, lengthscale=0.7, active_dims=[0])
    * RBF(1, variance=1.0, lengthscale=1.3, active_dims=[1], name="ctx"),
    # mixed families, overlapping dims, ARD part
    lambda: Matern32(2, variance=1.5, lengthscale=[0.9, 1.8], ARD=True)
    * RBF(1, variance=0.8, lengthscale=0.5, active_dims=[1]),
    # active_dims subset without a product
    lambda: RBF(1, variance=2.0, lengthscale=0.6, active_dims=[1]),
])
def test_fused_product_kernels_match_xla(make_kern):
    """Product / active_dims kernels through the fused interval path."""
    kern = make_kern()
    d = 2
    X = RNG.uniform(-2, 2, size=(11, d))
    Y = RNG.normal(size=(11, 1))
    gp = GPRegression(X, Y, kern, noise_var=0.01)

    grid = RNG.uniform(-3, 3, size=(300, d))
    beta = 2.0
    l, u = fused_intervals(kern, gp.state, np.asarray(grid, float), beta,
                           block=128)
    mu, var = gp_predict(kern, gp.state, grid)
    l_ref = np.asarray(mu) - beta * np.sqrt(np.asarray(var))
    u_ref = np.asarray(mu) + beta * np.sqrt(np.asarray(var))
    assert_allclose(np.asarray(l), l_ref, rtol=1e-9, atol=1e-10)
    assert_allclose(np.asarray(u), u_ref, rtol=1e-9, atol=1e-10)


def test_fused_expander_product_kernel_matches_xla():
    """Expander predicate with a contextual product kernel: the Pallas
    chunk path equals the XLA rank-1 fallback decision-for-decision."""
    import jax.numpy as jnp

    from safeopt_tpu.algorithms.safe_opt_core import safeopt_step

    kern = (RBF(1, variance=2.0, lengthscale=0.8, active_dims=[0])
            * RBF(1, variance=1.0, lengthscale=1.1, active_dims=[1]))
    X = np.hstack([np.linspace(-0.5, 0.5, 4)[:, None],
                   np.zeros((4, 1))])
    Y = np.array([[1.0], [1.3], [1.1], [0.8]])
    gp = GPRegression(X, Y, kern, noise_var=0.01)

    xs = np.linspace(-4, 4, 256)[:, None]
    grid = np.hstack([xs, np.zeros_like(xs)])
    args = ((kern,), (gp.state,), jnp.asarray(grid),
            jnp.asarray([0.0]), jnp.asarray(2.0),
            jnp.asarray([np.sqrt(2.0)]), jnp.asarray([0.0]))
    r1 = safeopt_step(*args, chunk=16, use_pallas=False)
    r2 = safeopt_step(*args, chunk=16, use_pallas=True)
    assert_allclose(np.asarray(r2.Q), np.asarray(r1.Q), rtol=1e-9,
                    atol=1e-10)
    np.testing.assert_array_equal(np.asarray(r2.S), np.asarray(r1.S))
    np.testing.assert_array_equal(np.asarray(r2.M), np.asarray(r1.M))
    np.testing.assert_array_equal(np.asarray(r2.G), np.asarray(r1.G))
    assert int(r2.next_idx) == int(r1.next_idx)


def test_step_with_pallas_matches_default():
    """The full fused step agrees with the XLA path under use_pallas."""
    import jax.numpy as jnp

    from safeopt_tpu.algorithms.safe_opt_core import safeopt_step

    kern = RBF(1, variance=2.0)
    gp = GPRegression(np.array([[0.0], [0.5]]), np.array([[1.2], [0.9]]),
                      kern, noise_var=0.01)
    grid = np.linspace(-4, 4, 256)[:, None]
    args = ((kern,), (gp.state,), jnp.asarray(grid),
            jnp.asarray([0.0]), jnp.asarray(2.0), jnp.asarray([np.sqrt(2.)]),
            jnp.asarray([0.0]))
    r1 = safeopt_step(*args, chunk=16, use_pallas=False)
    r2 = safeopt_step(*args, chunk=16, use_pallas=True)
    assert_allclose(np.asarray(r2.Q), np.asarray(r1.Q), rtol=1e-9,
                    atol=1e-10)
    np.testing.assert_array_equal(np.asarray(r2.S), np.asarray(r1.S))
    np.testing.assert_array_equal(np.asarray(r2.M), np.asarray(r1.M))
    np.testing.assert_array_equal(np.asarray(r2.G), np.asarray(r1.G))
    assert int(r2.next_idx) == int(r1.next_idx)


def test_fused_expander_matches_xla():
    """Pallas expander predicate equals the XLA rank-1 path."""
    import jax.numpy as jnp

    from safeopt_tpu.ops.fused_expander import fused_expander_predicate
    from safeopt_tpu.gp.regression import gp_predict

    kern = RBF(2, variance=2.0, lengthscale=0.9)
    X = RNG.uniform(-1, 1, size=(8, 2))
    Y = RNG.normal(size=(8, 1)) + 1.0
    gp = GPRegression(X, Y, kern, noise_var=0.01)
    st = gp.state

    grid = np.asarray(RNG.uniform(-3, 3, size=(256, 2)))
    beta, fmin_i = 2.0, 0.0
    mu, var = gp_predict(kern, st, grid)
    mu, var = np.asarray(mu), np.asarray(var)
    l = mu - beta * np.sqrt(var)
    u = mu + beta * np.sqrt(var)
    unsafe = l < fmin_i
    cand_idx = np.flatnonzero(~unsafe)[:16]
    Xc = grid[cand_idx]
    uc = u[cand_idx]
    valid = np.ones(len(cand_idx), dtype=bool)

    pred_pallas = np.asarray(fused_expander_predicate(
        kern, st, jnp.asarray(grid), jnp.asarray(unsafe), jnp.asarray(mu),
        jnp.asarray(np.sqrt(var)), jnp.asarray(Xc), jnp.asarray(uc),
        jnp.asarray(valid), jnp.asarray(beta), jnp.asarray(fmin_i),
        block=128))

    # XLA reference: rank-1 conditioning per candidate
    import scipy.linalg
    from reference_impl import RefGP, RefRBF
    ref = RefGP(X, Y, RefRBF(2, variance=2.0, lengthscale=0.9),
                noise_var=0.01)
    expected = np.zeros(len(cand_idx), dtype=bool)
    for j, gi in enumerate(cand_idx):
        ref.set_XY(np.vstack([X, grid[[gi]]]), np.vstack([Y, [[uc[j]]]]))
        mu2, var2 = ref.predict_noiseless(grid[unsafe])
        l2 = mu2.squeeze() - beta * np.sqrt(var2.squeeze())
        expected[j] = np.any(np.atleast_1d(l2) >= fmin_i)
        ref.set_XY(X, Y)
    np.testing.assert_array_equal(pred_pallas, expected)


def test_batched_intervals_match_single():
    import jax.numpy as jnp

    from safeopt_tpu.ops.fused_posterior import (fused_intervals,
                                                 fused_intervals_batched,
                                                 supports_batched)

    k1 = RBF(2, variance=2.0, lengthscale=0.8)
    k2 = RBF(2, variance=1.0, lengthscale=[1.5, 0.6], ARD=True)
    X = RNG.uniform(-2, 2, size=(9, 2))
    gp1 = GPRegression(X, RNG.normal(size=(9, 1)), k1, noise_var=0.01)
    gp2 = GPRegression(X, RNG.normal(size=(9, 1)), k2, noise_var=0.02)
    assert supports_batched((k1, k2), (gp1.state, gp2.state))
    assert not supports_batched((k1,), (gp1.state,))
    assert not supports_batched((k1, Matern32(2)),
                                (gp1.state, gp2.state))

    grid = jnp.asarray(RNG.uniform(-3, 3, size=(300, 2)), float)
    beta = 2.0
    batched = fused_intervals_batched((k1, k2), (gp1.state, gp2.state),
                                      grid, beta, block=128)
    for g, (kern, gp) in enumerate(((k1, gp1), (k2, gp2))):
        l_ref, u_ref = fused_intervals(kern, gp.state, grid, beta,
                                       block=128)
        assert_allclose(np.asarray(batched[g][0]), np.asarray(l_ref),
                        rtol=1e-10, atol=1e-12)
        assert_allclose(np.asarray(batched[g][1]), np.asarray(u_ref),
                        rtol=1e-10, atol=1e-12)


def test_batched_expander_in_full_step():
    """Pallas step with two same-family GPs (batched interval +
    expander kernels) equals the XLA path exactly."""
    import jax.numpy as jnp

    from safeopt_tpu.algorithms.safe_opt_core import safeopt_step

    k1 = RBF(1, variance=2.0)
    k2 = RBF(1, variance=1.5, lengthscale=1.4)
    X = np.array([[0.0], [0.6], [-0.5]])
    gp1 = GPRegression(X, np.array([[1.5], [1.1], [0.9]]), k1,
                       noise_var=0.01)
    gp2 = GPRegression(X, np.array([[0.8], [0.9], [0.6]]), k2,
                       noise_var=0.01)
    grid = np.linspace(-4, 4, 256)[:, None]
    args = ((k1, k2), (gp1.state, gp2.state), jnp.asarray(grid),
            jnp.asarray([0.0, 0.2]), jnp.asarray(2.0),
            jnp.asarray([np.sqrt(2.0), np.sqrt(1.5)]),
            jnp.asarray([0.0, 0.0]))
    r1 = safeopt_step(*args, chunk=16, use_pallas=False)
    r2 = safeopt_step(*args, chunk=16, use_pallas=True)
    assert_allclose(np.asarray(r2.Q), np.asarray(r1.Q), rtol=1e-9,
                    atol=1e-10)
    np.testing.assert_array_equal(np.asarray(r2.G), np.asarray(r1.G))
    assert int(r2.next_idx) == int(r1.next_idx)


def test_full_expander_sets_with_pallas_matches_default():
    """full_sets classification agrees between Pallas and XLA paths
    (round-2 fix: full_expander_sets now honors use_pallas)."""
    import jax.numpy as jnp

    from safeopt_tpu.algorithms.safe_opt_core import full_expander_sets

    kern = RBF(1, variance=2.0)
    gp = GPRegression(np.array([[0.0], [0.5]]), np.array([[1.2], [0.9]]),
                      kern, noise_var=0.01)
    grid = np.linspace(-4, 4, 256)[:, None]
    args = ((kern,), (gp.state,), jnp.asarray(grid),
            jnp.asarray([0.0]), jnp.asarray(2.0), jnp.asarray([np.sqrt(2.)]))
    r1 = full_expander_sets(*args, chunk=16, use_pallas=False)
    r2 = full_expander_sets(*args, chunk=16, use_pallas=True)
    assert_allclose(np.asarray(r2.Q), np.asarray(r1.Q), rtol=1e-9,
                    atol=1e-10)
    np.testing.assert_array_equal(np.asarray(r2.S), np.asarray(r1.S))
    np.testing.assert_array_equal(np.asarray(r2.M), np.asarray(r1.M))
    np.testing.assert_array_equal(np.asarray(r2.G), np.asarray(r1.G))


def test_fused_intervals_large_capacity_triangular_path():
    """cap=512 exercises the lower-triangular tile-skip multiply
    (ops/fused_posterior._tri_matmul); results must match the XLA
    posterior exactly."""
    import jax.numpy as jnp

    from safeopt_tpu.ops.fused_posterior import fused_intervals

    rng = np.random.default_rng(3)
    n_obs = 500
    X = rng.uniform(-4, 4, size=(n_obs, 2))
    Y = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
         + 0.05 * rng.normal(size=n_obs))[:, None]
    kern = RBF(2, variance=2.0, lengthscale=1.2)
    gp = GPRegression(X, Y, kern, noise_var=0.05 ** 2, capacity=512)

    grid = rng.uniform(-5, 5, size=(1024, 2))
    gd = jnp.asarray(grid, gp.state.X.dtype)
    beta = 2.0
    l, u = fused_intervals(kern, gp.state, gd, jnp.asarray(beta), block=512)

    mu, var = gp_predict(kern, gp.state, gd)
    sd = np.sqrt(np.asarray(var))
    assert_allclose(np.asarray(l), np.asarray(mu) - beta * sd,
                    rtol=1e-8, atol=1e-9)
    assert_allclose(np.asarray(u), np.asarray(mu) + beta * sd,
                    rtol=1e-8, atol=1e-9)


def test_batched_exponential_matches_single():
    """Regression (round-2 review): the batched multi-GP kernels must
    implement the Exponential gram, not fall through to Matern-3/2."""
    import jax.numpy as jnp

    from safeopt_tpu.gp import Exponential
    from safeopt_tpu.ops.fused_posterior import (fused_intervals,
                                                 fused_intervals_batched,
                                                 supports_batched)

    k1 = Exponential(2, variance=2.0, lengthscale=0.8)
    k2 = Exponential(2, variance=1.0, lengthscale=1.4)
    X = RNG.uniform(-2, 2, size=(9, 2))
    gp1 = GPRegression(X, RNG.normal(size=(9, 1)), k1, noise_var=0.01)
    gp2 = GPRegression(X, RNG.normal(size=(9, 1)), k2, noise_var=0.02)
    assert supports_batched((k1, k2), (gp1.state, gp2.state), 2)

    grid = jnp.asarray(RNG.uniform(-3, 3, size=(300, 2)), float)
    batched = fused_intervals_batched((k1, k2), (gp1.state, gp2.state),
                                      grid, 2.0, block=128)
    for g, (kern, gp) in enumerate(((k1, gp1), (k2, gp2))):
        l_ref, u_ref = fused_intervals(kern, gp.state, grid, 2.0,
                                       block=128)
        assert_allclose(np.asarray(batched[g][0]), np.asarray(l_ref),
                        rtol=1e-10, atol=1e-12)
        assert_allclose(np.asarray(batched[g][1]), np.asarray(u_ref),
                        rtol=1e-10, atol=1e-12)


def test_batched_rejects_narrow_kernels():
    """Regression (round-2 review): a kernel reading fewer columns than
    the grid must not take the batched path (its gram would accumulate
    distances over columns it does not own) — and the full step must
    still be decision-identical between Pallas and XLA."""
    import jax.numpy as jnp

    from safeopt_tpu.algorithms.safe_opt_core import safeopt_step
    from safeopt_tpu.ops.fused_posterior import supports_batched

    k1 = RBF(1, variance=2.0)          # reads column 0 of a 2-col grid
    k2 = RBF(1, variance=1.5)
    X = np.hstack([np.linspace(-0.5, 0.5, 4)[:, None], np.zeros((4, 1))])
    gp1 = GPRegression(X, np.array([[1.2], [1.4], [1.1], [0.9]]), k1,
                       noise_var=0.01)
    gp2 = GPRegression(X, np.array([[0.9], [1.0], [0.8], [0.7]]), k2,
                       noise_var=0.01)
    assert not supports_batched((k1, k2), (gp1.state, gp2.state), 2)

    xs = np.linspace(-3, 3, 256)[:, None]
    grid = np.hstack([xs, np.zeros_like(xs)])
    args = ((k1, k2), (gp1.state, gp2.state), jnp.asarray(grid),
            jnp.asarray([0.0, 0.0]), jnp.asarray(2.0),
            jnp.asarray([np.sqrt(2.0), np.sqrt(1.5)]),
            jnp.asarray([0.0, 0.0]))
    r1 = safeopt_step(*args, chunk=16, use_pallas=False)
    r2 = safeopt_step(*args, chunk=16, use_pallas=True)
    assert_allclose(np.asarray(r2.Q), np.asarray(r1.Q), rtol=1e-9,
                    atol=1e-10)
    np.testing.assert_array_equal(np.asarray(r2.S), np.asarray(r1.S))
    assert int(r2.next_idx) == int(r1.next_idx)


# ---------------------------------------------------------------------------
# round 3: emulated 3-pass precision (certified reduced-precision mode)
# ---------------------------------------------------------------------------


def test_dot3_approximates_full_precision():
    """The hi/lo bf16 3-pass emulation reproduces the full-precision
    product to ~bf16^2 relative accuracy (the XLA HIGH contract)."""
    import jax.numpy as jnp

    from safeopt_tpu.ops.fused_posterior import _dot3

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(64, 64)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
    exact = np.asarray(a) @ np.asarray(b)
    approx = np.asarray(_dot3(a, b, jnp.float32))
    scale = np.abs(exact).max()
    assert np.max(np.abs(approx - exact)) / scale < 5e-5


def test_fused_intervals_three_pass_close_to_exact():
    d = 2
    kern = RBF(d, variance=2.0, lengthscale=0.8)
    X = RNG.uniform(-2, 2, size=(10, d))
    Y = RNG.normal(size=(10, 1))
    gp = GPRegression(X, Y, kern, noise_var=0.01)
    grid = RNG.uniform(-3, 3, size=(300, d))
    beta = 2.0
    l3, u3 = fused_intervals(kern, gp.state, np.asarray(grid, float),
                             beta, block=128, three_pass=True)
    l, u = fused_intervals(kern, gp.state, np.asarray(grid, float),
                           beta, block=128)
    # three-pass noise is tiny relative to the interval magnitudes
    assert_allclose(np.asarray(l3), np.asarray(l), atol=5e-4)
    assert_allclose(np.asarray(u3), np.asarray(u), atol=5e-4)
    assert not np.array_equal(np.asarray(l3), np.asarray(l))


def test_certified_scan_high_precision_pallas_path():
    """interval_precision='high' + use_pallas runs the emulated 3-pass
    kernel (Mosaic has no HIGH dot) and, with the refinement bands,
    reproduces the full-precision decisions on a benign problem."""
    import jax.numpy as jnp

    from safeopt_tpu import linearly_spaced_combinations
    from safeopt_tpu.algorithms.safe_opt_core import certified_scan

    d = 2
    kern = RBF(d, variance=2.0, lengthscale=1.0)
    X = RNG.uniform(-1.5, 1.5, size=(12, d))
    Y = (1.0 + np.exp(-0.5 * np.sum(X ** 2, axis=1)))[:, None]
    gp = GPRegression(X, Y, kern, noise_var=1e-3)
    grid = jnp.asarray(np.asarray(linearly_spaced_combinations(
        [(-3.0, 3.0), (-3.0, 3.0)], 40)))
    dtype = gp.state.X.dtype
    common = ((kern,), (gp.state,), grid, jnp.asarray([0.9], dtype),
              jnp.asarray(2.0, dtype), jnp.asarray([np.sqrt(2.0)], dtype),
              jnp.asarray([0.0], dtype), jnp.asarray(1e-3, dtype))
    res3, packed3 = certified_scan(
        *common, refine_band=jnp.asarray(5e-3, dtype), k=64, refine_k=32,
        refine_band_k=256, use_pallas=True, interval_precision="high")
    res, packed = certified_scan(*common, k=64, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(res3.S), np.asarray(res.S))
    assert int(np.asarray(packed3)[1]) == int(np.asarray(packed)[1])


@pytest.mark.parametrize("num_gps,cap", [(2, 64), (4, 32), (3, 64)],
                         ids=["2gp-cap64", "4gp-cap32", "3gp-odd"])
def test_batched_group_stacking_matches_single(num_gps, cap):
    """The block-diagonal stacked whitened solve (group_size > 1 for
    cap < 128) must reproduce the per-GP solve exactly — the
    off-diagonal zero blocks contribute exact +0.0 terms. 3gp-odd has
    no even group split: the last group zero-pads its factor and gram
    blocks and must stay exact."""
    import jax.numpy as jnp

    from safeopt_tpu.ops.fused_posterior import (fused_intervals,
                                                 fused_intervals_batched,
                                                 supports_batched)

    kernels, gps = [], []
    for g in range(num_gps):
        k = RBF(2, variance=1.0 + g, lengthscale=0.7 + 0.3 * g)
        X = RNG.uniform(-2, 2, size=(cap - 7, 2))
        gps.append(GPRegression(X, RNG.normal(size=(cap - 7, 1)), k,
                                noise_var=0.01 * (g + 1), capacity=cap))
        kernels.append(k)
    states = tuple(gp.state for gp in gps)
    assert supports_batched(tuple(kernels), states, 2)

    grid = jnp.asarray(RNG.uniform(-3, 3, size=(384, 2)), float)
    batched = fused_intervals_batched(tuple(kernels), states, grid, 2.0,
                                      block=128)
    for g in range(num_gps):
        l_ref, u_ref = fused_intervals(kernels[g], states[g], grid, 2.0,
                                       block=128)
        assert_allclose(np.asarray(batched[g][0]), np.asarray(l_ref),
                        rtol=1e-10, atol=1e-12)
        assert_allclose(np.asarray(batched[g][1]), np.asarray(u_ref),
                        rtol=1e-10, atol=1e-12)


def test_batched_group_stacking_three_pass():
    """Stacked solve under the emulated 3-pass precision: same hi/lo
    split semantics as the per-GP path."""
    import jax.numpy as jnp

    from safeopt_tpu.ops.fused_posterior import (fused_intervals,
                                                 fused_intervals_batched)

    kernels, gps = [], []
    for g in range(2):
        k = RBF(2, variance=2.0 - 0.5 * g, lengthscale=1.0 + 0.4 * g)
        X = RNG.uniform(-2, 2, size=(50, 2))
        gps.append(GPRegression(X, RNG.normal(size=(50, 1)), k,
                                noise_var=0.01, capacity=64))
        kernels.append(k)
    states = tuple(gp.state for gp in gps)

    grid = jnp.asarray(RNG.uniform(-3, 3, size=(384, 2)), float)
    batched = fused_intervals_batched(tuple(kernels), states, grid, 2.0,
                                      block=128, three_pass=True)
    for g in range(2):
        l_ref, u_ref = fused_intervals(kernels[g], states[g], grid, 2.0,
                                       block=128, three_pass=True)
        assert_allclose(np.asarray(batched[g][0]), np.asarray(l_ref),
                        rtol=1e-10, atol=1e-12)
        assert_allclose(np.asarray(batched[g][1]), np.asarray(u_ref),
                        rtol=1e-10, atol=1e-12)


class TestVmemFeasibilityGate:
    """cap=1024 x 2 GPs x 3-pass exceeded the 16 MB scoped VMEM at
    compile time on hardware (round 5): the resident whitened factors
    (num_gps * cap^2 f32) were unbudgeted. Oversized configs must
    route to the XLA interval path instead of failing to compile."""

    def test_feasibility_matrix(self):
        from safeopt_tpu.ops.fused_posterior import fused_vmem_ok
        assert fused_vmem_ok(512, 2, 2)          # production bench shape
        assert fused_vmem_ok(256, 2, 2)
        assert not fused_vmem_ok(1024, 2, 2)     # the hardware OOM
        assert not fused_vmem_ok(2048, 1, 2)

    def test_supports_batched_respects_vmem(self):
        import numpy as np

        from safeopt_tpu.gp import GPRegression, RBF
        from safeopt_tpu.ops.fused_posterior import supports_batched

        def gps(cap):
            rng = np.random.default_rng(0)
            X = rng.uniform(-1, 1, size=(8, 2))
            Y = X.sum(axis=1, keepdims=True)
            return [GPRegression(X, Y, RBF(2), noise_var=1e-3,
                                 capacity=cap) for _ in range(2)]

        small = gps(256)
        big = gps(1024)
        assert supports_batched(tuple(g.kern for g in small),
                                tuple(g.state for g in small), 2)
        assert not supports_batched(tuple(g.kern for g in big),
                                    tuple(g.state for g in big), 2)

    def test_cap1024_step_runs_via_xla_fallback(self):
        """use_pallas=True at an infeasible capacity must transparently
        take the XLA interval path and produce the same decisions."""
        import jax.numpy as jnp
        import numpy as np

        from safeopt_tpu.algorithms.safe_opt_core import safeopt_step
        from safeopt_tpu.config import default_dtype
        from safeopt_tpu.gp import GPRegression, RBF
        from safeopt_tpu.utils import linearly_spaced_combinations

        rng = np.random.default_rng(1)
        X = rng.uniform(-2, 2, size=(40, 2))
        Y = (np.exp(-0.5 * np.sum(X ** 2, axis=1)))[:, None]
        gp = GPRegression(X, Y, RBF(2), noise_var=1e-3, capacity=1024)
        grid = jnp.asarray(
            linearly_spaced_combinations([(-2., 2.), (-2., 2.)], 20),
            default_dtype())
        dtype = default_dtype()
        args = ((gp.kern,), (gp.state,), grid,
                jnp.asarray([0.2], dtype), jnp.asarray(2.0, dtype),
                jnp.asarray([1.0], dtype), jnp.asarray([0.0], dtype))
        r_pallas = safeopt_step(*args, chunk=8, use_pallas=True)
        r_xla = safeopt_step(*args, chunk=8, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(r_pallas.S),
                                      np.asarray(r_xla.S))
        assert int(r_pallas.next_idx) == int(r_xla.next_idx)

    def test_chunked_posterior_matches_unchunked(self, monkeypatch):
        """With _V_BYTES_LIMIT forced tiny, the chunked XLA interval
        path (and the expander's chunked cross terms) must reproduce
        the unchunked decisions exactly — HBM-OOM protection at
        cap>=1024 x 1e6 grids cannot change results."""
        import jax.numpy as jnp
        import numpy as np

        import safeopt_tpu.algorithms.safe_opt_core as core
        from safeopt_tpu.config import default_dtype
        from safeopt_tpu.gp import GPRegression, RBF
        from safeopt_tpu.utils import linearly_spaced_combinations

        rng = np.random.default_rng(3)
        X = rng.uniform(-2, 2, size=(30, 2))
        Y = (np.exp(-0.5 * np.sum(X ** 2, axis=1)))[:, None]
        gp = GPRegression(X, Y, RBF(2), noise_var=1e-3, capacity=64)
        grid = jnp.asarray(
            linearly_spaced_combinations([(-2., 2.), (-2., 2.)], 30),
            default_dtype())
        dtype = default_dtype()
        args = ((gp.kern,), (gp.state,), grid,
                jnp.asarray([0.2], dtype), jnp.asarray(2.0, dtype),
                jnp.asarray([1.0], dtype), jnp.asarray([0.0], dtype))
        ref = core.safeopt_step(*args, chunk=8, use_pallas=False)
        monkeypatch.setattr(core, "_V_BYTES_LIMIT", 1)
        monkeypatch.setattr(core, "_CHUNK_ROWS", 128)
        core.safeopt_step._clear_cache()
        chunked = core.safeopt_step(*args, chunk=8, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(chunked.S),
                                      np.asarray(ref.S))
        np.testing.assert_array_equal(np.asarray(chunked.G),
                                      np.asarray(ref.G))
        assert int(chunked.next_idx) == int(ref.next_idx)
        core.safeopt_step._clear_cache()
