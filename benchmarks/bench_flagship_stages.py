"""Per-stage breakdown of the FLAGSHIP step (cap=64, n=50, 1e6 grid).

The flagship bench row reads ~3.9 ms device against a 0.50 ms 6-pass
MXU floor (roofline fraction 0.09): at this capacity the matmuls are
nearly free and the step is VPU/latency bound. This script measures
where the other ~3.4 ms actually lives, stage by stage, with the same
truncated-program protocol as bench_cap512_stages.py:

  intervals    batched 6-pass Pallas interval pass over the 1e6 grid
  +classify    + _classify reductions (S/M/cand/width over 1e6 rows)
  +expander    + the full expander while_loop (chunk=32)
  +select      + query selection and result assembly (= full step)

Reference rows:

  step(full)   safeopt_step itself (cross-check of the sum)
  intervals3   3-pass interval pass (how much of the interval stage is
               MXU passes vs fixed kernel overhead)
  topk_1e6     ONE partial_top_k (k=32) over a derived full-grid key —
               the first expander chunk's selection sweep
  classify_xla the _classify reductions alone on a precomputed Q
               (feed-only; isolates the reduction sweeps)

Timing protocol (CLAUDE.md): reps inside ONE jit via lax.fori_loop
with carry-perturbed operands, whole result consumed, scalar pulled,
difference reps=1 vs reps=9.
"""

import _bootstrap  # noqa: F401
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from safeopt_tpu import linearly_spaced_combinations
from safeopt_tpu.algorithms import safe_opt_core as core
from safeopt_tpu.config import MATMUL_PRECISION
from safeopt_tpu.gp import GPRegression, RBF
from safeopt_tpu.ops.topk import partial_top_k

# EXACTLY bench.py's flagship problem (_build_gps(rng, 50, capacity=64),
# spread=1.5): the observation cluster sits in the middle of the
# [-5, 5]^2 grid, so most of the 1e6 candidates are unsafe and the
# expander walk sees a realistic candidate population. An earlier
# variant with spread=4.0 made the walk trivially short and
# under-reported the expander stage ~8x.
rng = np.random.default_rng(0)
n_obs, cap = 50, 64
grid_np = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 1000)
X = rng.uniform(-1.5, 1.5, size=(n_obs, 2))
Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
      + 0.05 * rng.normal(size=n_obs))[:, None]
Yg = (1.0 - 0.1 * np.sum(X ** 2, axis=1)
      + 0.05 * rng.normal(size=n_obs))[:, None]
gp_f = GPRegression(X, Yf, RBF(2, variance=2.0, lengthscale=1.0),
                    noise_var=0.05 ** 2, capacity=cap)
gp_g = GPRegression(X, Yg, RBF(2, variance=1.0, lengthscale=1.5),
                    noise_var=0.05 ** 2, capacity=cap)

kernels = (gp_f.kern, gp_g.kern)
states = (gp_f.state, gp_g.state)
dtype = states[0].X.dtype
grid_dev = jnp.asarray(grid_np, dtype)
fmin = jnp.asarray([0.2, 0.5], dtype)
scaling = jnp.asarray([np.sqrt(2.0), 1.0], dtype)
threshold = jnp.asarray([0.0, 0.0], dtype)
N = grid_dev.shape[0]
CHUNK = 32
BETA = jnp.asarray(2.0, dtype)


def stage(grid, beta, upto, three_pass=False):
    """safeopt_step's exact structure, truncated after ``upto``."""
    valid = jnp.ones((N,), bool)
    with jax.default_matmul_precision(MATMUL_PRECISION):
        Q, mus, sigmas, Vs = core._confidence_intervals(
            kernels, states, grid, beta, use_pallas=True,
            three_pass=three_pass)
        if upto == "intervals":
            return jnp.max(Q)
        S, M, cand, width, has_safe = core._classify(
            Q, fmin, scaling, threshold, beta, valid)
        if upto == "classify":
            return (jnp.max(Q) + jnp.sum(M).astype(dtype)
                    + jnp.sum(S).astype(dtype)
                    + jnp.sum(cand).astype(dtype))
        G = core._find_first_expander(kernels, states, grid, Q,
                                      valid & ~S, mus, sigmas, Vs, fmin,
                                      beta, None, cand, width, CHUNK,
                                      use_pallas=True)
        if upto == "expander":
            return (jnp.max(Q) + jnp.sum(M).astype(dtype)
                    + jnp.any(G).astype(dtype))
        next_idx = core._select_query(Q, S, M, G, scaling, ucb=False)
        res = core._pack_result(Q, S, M, G, next_idx, has_safe)
        return jnp.max(res.Q) + jnp.sum(res.diag).astype(dtype)


def full(grid, beta, upto, three_pass=False):
    res = core.safeopt_step(kernels, states, grid, fmin, beta, scaling,
                            threshold, chunk=CHUNK, use_pallas=True)
    return jnp.max(res.Q) + jnp.sum(res.diag).astype(dtype)


def topk_1e6(grid, beta, upto, three_pass=False):
    key = jnp.max(grid, axis=1) * beta
    vals, idx = partial_top_k(key, CHUNK)
    return jnp.sum(vals) + jnp.sum(idx).astype(dtype)


# Precomputed Q for the feed-only classify row: perturb from the carry
# so reps aren't elided, but skip the interval pass entirely.
def classify_xla(grid, beta, upto, three_pass=False):
    valid = jnp.ones((N,), bool)
    Q = jnp.stack([grid[:, 0] * beta, grid[:, 0] * beta + 1.0,
                   grid[:, 1] * beta, grid[:, 1] * beta + 1.0], axis=1)
    S, M, cand, width, has_safe = core._classify(
        Q, fmin, scaling, threshold, beta, valid)
    return (jnp.sum(M).astype(dtype) + jnp.sum(S).astype(dtype)
            + jnp.sum(cand).astype(dtype) + jnp.max(width))


def timed(fn, upto, reps, **kw):
    @jax.jit
    def prog(g0):
        def body(i, carry):
            b, acc = carry
            v = fn(grid_dev, b, upto, **kw)
            acc = acc + v
            b = b + (acc % 2).astype(dtype) * 1e-9
            return b, acc
        _, acc = jax.lax.fori_loop(0, reps, body,
                                   (BETA, jnp.zeros((), dtype)))
        return acc

    float(prog(grid_dev))                       # warmup/compile
    best = np.inf
    for j in range(1, 4):
        g = grid_dev * (1.0 + j * 1e-7)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        float(prog(g))
        best = min(best, time.perf_counter() - t0)
    return best


def per_call(fn, label, upto, **kw):
    t1 = timed(fn, upto, 1, **kw)
    t9 = timed(fn, upto, 9, **kw)
    ms = (t9 - t1) / 8 * 1e3
    print(f"{label:16s} {ms:8.3f} ms   (t1={t1*1e3:7.2f}  t9={t9*1e3:7.2f})",
          flush=True)
    return ms


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    out = {}
    prev = 0.0
    for upto in ("intervals", "classify", "expander", "select"):
        ms = per_call(stage, f"6p:{upto}", upto)
        out[f"cum_{upto}"] = round(ms, 3)
        out[f"stage_{upto}"] = round(ms - prev, 3)
        prev = ms
    out["full_step"] = round(per_call(full, "step(full)", "-"), 3)
    out["intervals_3pass"] = round(
        per_call(stage, "3p:intervals", "intervals", three_pass=True), 3)
    out["topk_1e6"] = round(per_call(topk_1e6, "topk_1e6", "-"), 3)
    out["classify_xla"] = round(per_call(classify_xla, "classify_xla",
                                         "-"), 3)
    print(json.dumps(out))
