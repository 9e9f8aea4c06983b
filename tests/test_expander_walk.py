"""The compacted-order expander walk must match the masked top_k walk.

``_find_first_expander`` has two execution paths that must be
bit-identical: the compacted candidate list sorted by the reference
comparator (width descending, larger grid index on ties,
/root/reference/safeopt/gp_opt.py:542-552), and the per-round
``partial_top_k`` masked walk it falls back to when the candidate set
overflows the prefetch budget. The golden lockstep tests pin the
combined result against the NumPy reference; these tests pin the two
paths against EACH OTHER on randomized configurations, including the
exhaustion (no expander exists) and overflow cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from safeopt_tpu.algorithms import safe_opt_core as core
from safeopt_tpu.gp import GPRegression, RBF


def _step_inputs(seed, n_obs=25, n_grid=3000, d=1, fmin_vals=(0.0, 0.4)):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2.0, 2.0, size=(n_obs, d))
    Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
          + 0.05 * rng.normal(size=n_obs))[:, None]
    Yg = (1.2 - 0.15 * np.sum(X ** 2, axis=1)
          + 0.05 * rng.normal(size=n_obs))[:, None]
    gp_f = GPRegression(X, Yf, RBF(d, variance=2.0, lengthscale=0.8),
                        noise_var=0.05 ** 2)
    gp_g = GPRegression(X, Yg, RBF(d, variance=1.0, lengthscale=1.2),
                        noise_var=0.05 ** 2)
    kernels = (gp_f.kern, gp_g.kern)
    states = (gp_f.state, gp_g.state)
    dtype = states[0].X.dtype
    grid = jnp.asarray(
        rng.uniform(-5.0, 5.0, size=(n_grid, d)), dtype)
    fmin = jnp.asarray(fmin_vals, dtype)
    beta = jnp.asarray(2.0, dtype)
    scaling = jnp.asarray([np.sqrt(2.0), 1.0], dtype)
    threshold = jnp.asarray([0.0, 0.0], dtype)
    return kernels, states, grid, fmin, beta, scaling, threshold


def _walk(prefetch, chunk, inputs):
    kernels, states, grid, fmin, beta, scaling, threshold = inputs
    N = grid.shape[0]
    valid = jnp.ones((N,), bool)
    Q, mus, sigmas, Vs = core._confidence_intervals(
        kernels, states, grid, beta)
    S, M, cand, width, has_safe = core._classify(
        Q, fmin, scaling, threshold, beta, valid)
    G = core._find_first_expander(
        kernels, states, grid, Q, valid & ~S, mus, sigmas, Vs, fmin,
        beta, None, cand, width, chunk, prefetch=prefetch)
    return np.asarray(cand), np.asarray(G)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 7])
@pytest.mark.parametrize("chunk", [4, 32])
def test_ordered_walk_matches_masked_walk(seed, chunk):
    inputs = _step_inputs(seed)
    cand_o, g_ordered = _walk(16384, chunk, inputs)
    # prefetch=1 makes B=chunk; any config with more candidates than
    # one chunk takes the masked-walk fallback
    cand_m, g_masked = _walk(1, chunk, inputs)
    assert cand_o.sum() == cand_m.sum()
    if cand_o.sum() <= chunk:
        pytest.skip("config too small to exercise both paths")
    np.testing.assert_array_equal(g_ordered, g_masked)


def test_exhaustion_no_expander_agrees():
    # fmin high enough that no unsafe point is ever rescued: the walk
    # must visit every candidate on both paths and return all-False
    inputs = _step_inputs(11, fmin_vals=(0.0, 1.05))
    cand, g_ordered = _walk(16384, 8, inputs)
    _, g_masked = _walk(1, 8, inputs)
    np.testing.assert_array_equal(g_ordered, g_masked)


def test_ordered_walk_visits_reference_order():
    """The compaction+sort realizes exactly the masked walk's visit
    sequence (width desc, larger grid index on exact ties), checked by
    comparing against iterated ``_next_chunk`` on a tie-heavy key."""
    rng = np.random.default_rng(5)
    N, chunk = 2000, 16
    width = jnp.asarray(
        rng.integers(0, 6, size=N).astype(np.float32))  # heavy ties
    cand = jnp.asarray(rng.random(N) < 0.2)

    remaining = cand & True
    masked_seq = []
    while bool(jnp.any(remaining)):
        remaining, idxs, valids = core._next_chunk(remaining, width, chunk)
        masked_seq.extend(int(i) for i, v in zip(idxs, valids) if bool(v))

    B = -(-min(16384, N) // chunk) * chunk
    pos = jnp.cumsum(cand.astype(jnp.int32)) - 1
    slot = jnp.where(cand & (pos < B), pos, B)
    cw = jnp.full((B + 1,), -jnp.inf, width.dtype).at[slot].set(
        jnp.where(cand, width, -jnp.inf))[:B]
    ci = jnp.full((B + 1,), 0, jnp.int32).at[slot].set(
        jnp.arange(N, dtype=jnp.int32))[:B]
    import jax
    _, _, sidx = jax.lax.sort((-cw, -ci, ci), num_keys=2)
    n_cand = int(jnp.sum(cand))
    ordered_seq = [int(i) for i in np.asarray(sidx)[:n_cand]]
    assert ordered_seq == masked_seq
