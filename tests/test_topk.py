"""partial_top_k must equal lax.top_k bit-for-bit, ties included.

The fused step's expander visit order and the certified boundary
triage both depend on lax.top_k's exact tie rule (value descending,
index ascending — which, through the flip trick in
safe_opt_core._next_chunk, realizes the reference's
larger-grid-index-on-ties order, gp_opt.py:542-552). The hierarchical
select must therefore be indistinguishable from the monolithic one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safeopt_tpu.ops.topk import partial_top_k


def _check(key, k, rows=1024):
    key = jnp.asarray(key)
    v_ref, i_ref = jax.lax.top_k(key, k)
    v, i = partial_top_k(key, k, rows=rows)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


class TestPartialTopK:
    @pytest.mark.parametrize("n", [100_000, 99_991, 262_144])
    @pytest.mark.parametrize("k", [1, 32, 128])
    def test_random(self, n, k):
        rng = np.random.default_rng(n + k)
        _check(rng.normal(size=n).astype(np.float32), k)

    def test_massive_ties(self):
        # widths quantize heavily on coarse grids: few distinct values
        rng = np.random.default_rng(0)
        key = rng.integers(0, 5, size=50_000).astype(np.float32)
        _check(key, 64)

    def test_single_value_everywhere(self):
        _check(np.full(40_000, 3.5, np.float32), 32)

    def test_masked_minus_inf(self):
        # the callers mask non-candidates to -inf; most rows are empty
        rng = np.random.default_rng(1)
        key = np.full(80_000, -np.inf, np.float32)
        live = rng.choice(80_000, size=17, replace=False)
        key[live] = rng.normal(size=17).astype(np.float32)
        _check(key, 64)   # fewer finite entries than k

    def test_all_minus_inf(self):
        _check(np.full(70_000, -np.inf, np.float32), 32)

    def test_flip_trick_tie_order(self):
        # reference visit order: width desc, LARGER grid index on ties
        key = np.zeros(30_000, np.float32)
        key[[7, 19, 19_000]] = 2.0
        flipped = jnp.flip(jnp.asarray(key))
        _check(np.asarray(flipped), 16)

    @pytest.mark.parametrize("rows", [7, 256, 4096])
    def test_row_counts(self, rows):
        rng = np.random.default_rng(rows)
        _check(rng.normal(size=123_457).astype(np.float32), 32, rows=rows)

    def test_short_input_falls_back(self):
        rng = np.random.default_rng(2)
        _check(rng.normal(size=300).astype(np.float32), 32)
        _check(rng.normal(size=31).astype(np.float32), 31)

    def test_large_k_falls_back(self):
        rng = np.random.default_rng(3)
        _check(rng.normal(size=20_000).astype(np.float32), 4096)

    def test_inside_jit_and_grad_free_paths(self):
        rng = np.random.default_rng(4)
        key = jnp.asarray(rng.normal(size=65_536).astype(np.float32))
        f = jax.jit(lambda x: partial_top_k(x, 32))
        v, i = f(key)
        v_ref, i_ref = jax.lax.top_k(key, 32)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
