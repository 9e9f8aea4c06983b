"""Per-stage breakdown of the cap512 reduced-precision certified step.

VERDICT r3 #2: the certified cap512 step measured 26-27 ms against a
~15 ms component-sum argument; this script measures where the
difference actually lives, on hardware, stage by stage:

  intervals3   3-pass (_dot3) Pallas interval pass over the 1e6 grid
  +refine      + _refine_Q (safety-band restore, rk=0 / band_k=20480)
  +classify    + _classify reductions on the refined Q
  +triage      + the f64-band triage top_k over the refined subset
  +expander    + the full expander while_loop (chunk=32)
  +select      + query selection and result/packed-buffer assembly
  full         certified_scan itself (cross-check of the sum)

Reference rows:

  intervals6   full-precision (6-pass f32) Pallas interval pass
  topk_width   ONE partial_top_k over a derived full-grid key — the
               marginal price of a full-grid selection sweep
  refine_rk    _refine_Q with refine_k=1024 (the shipped strict
               default: unified max-combined key, one top-9216) minus
               the rk=0 refine — the measured trajectory-identity cost

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

rng = np.random.default_rng(0)
n_obs, cap = 500, 512
grid_np = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 1000)
X = rng.uniform(-4.0, 4.0, size=(n_obs, 2))
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
K = 4096
BAND = jnp.asarray(1e-3, dtype)
RBAND = jnp.asarray(1e-2, dtype)
RBK = 20480
BETA = jnp.asarray(2.0, dtype)


def stage(grid, beta, upto, rk=0, three_pass=True):
    """certified_scan's exact structure, truncated after ``upto``."""
    valid = jnp.ones((N,), bool)
    with jax.default_matmul_precision(MATMUL_PRECISION):
        Q, mus, sigmas, Vs = core._confidence_intervals(
            kernels, states, grid, beta, use_pallas=True,
            three_pass=three_pass)
        if upto == "intervals":
            return jnp.max(Q)
        Q, refine_pop, refined_idx = core._refine_Q(
            kernels, states, grid, Q, fmin, beta, scaling, valid,
            rk, RBK, RBAND)
        mus, sigmas = core._moments_from_Q(Q, BETA)
        Vs = [None] * len(mus)
        if upto == "refine":
            return jnp.max(Q) + refine_pop.astype(dtype)
        S, M, cand, width, has_safe = core._classify(
            Q, fmin, scaling, threshold, beta, valid)
        if upto == "classify":
            return jnp.max(Q) + jnp.sum(M).astype(dtype) \
                + jnp.sum(S).astype(dtype)
        sub = core._safety_margin(Q[refined_idx], fmin, scaling,
                                  jnp.ones((refined_idx.shape[0],), bool))
        neg, j = partial_top_k(-sub, K)
        idx = jnp.take(refined_idx, j)
        within = (-neg) < BAND
        if upto == "triage":
            return (jnp.max(Q) + jnp.sum(M).astype(dtype)
                    + jnp.sum(idx).astype(dtype)
                    + jnp.sum(within).astype(dtype))
        G = core._find_first_expander(kernels, states, grid, Q,
                                      valid & ~S, mus, sigmas, Vs, fmin,
                                      beta, None, cand, width, CHUNK,
                                      use_pallas=True)
        if upto == "expander":
            return (jnp.max(Q) + jnp.sum(M).astype(dtype)
                    + jnp.sum(idx).astype(dtype)
                    + jnp.any(G).astype(dtype))
        next_idx = core._select_query(Q, S, M, G, scaling, ucb=False)
        res = core._pack_result(Q, S, M, G, next_idx, has_safe)
        return (jnp.max(res.Q) + jnp.sum(res.diag).astype(dtype)
                + jnp.sum(idx).astype(dtype))


def full(grid, beta, upto, rk=0, three_pass=True):
    res, packed = core.certified_scan(
        kernels, states, grid, fmin, beta, scaling, threshold, BAND,
        refine_band=RBAND, k=K, refine_k=rk, refine_band_k=RBK,
        chunk=CHUNK, use_pallas=True,
        interval_precision="high" if three_pass else None)
    return jnp.max(res.Q) + jnp.sum(packed).astype(dtype)


def topk_width(grid, beta, upto, rk=0, three_pass=True):
    """One partial_top_k over a freshly derived full-grid key array."""
    key = jnp.max(grid, axis=1) * beta
    vals, idx = partial_top_k(key, 128)
    return jnp.sum(vals) + jnp.sum(idx).astype(dtype)


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
    for upto in ("intervals", "refine", "classify", "triage", "expander",
                 "select"):
        ms = per_call(stage, f"3p:{upto}", upto)
        out[f"cum_{upto}"] = round(ms, 3)
        out[f"stage_{upto}"] = round(ms - prev, 3)
        prev = ms
    out["full_certified"] = round(per_call(full, "full(scan)", "full"), 3)
    out["intervals_6pass"] = round(
        per_call(stage, "6p:intervals", "intervals", three_pass=False), 3)
    out["topk_width_128"] = round(
        per_call(topk_width, "topk_width", "-"), 3)
    out["refine_rk1024_cum"] = round(
        per_call(stage, "3p:refine+rk", "refine", rk=1024), 3)
    out["full_rk1024"] = round(
        per_call(full, "full(rk=1024)", "full", rk=1024), 3)
    print(json.dumps(out))
