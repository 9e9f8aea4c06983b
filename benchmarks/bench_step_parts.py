"""Component breakdown of the flagship 1e6-grid fused step on the TPU.

Times each stage of ``safeopt_step`` (bench.py flagship config: 2 RBF
GPs, cap=64, 1e6-point grid, chunk=32, Pallas on) by building nested
prefix programs and differencing — all inside one jit per program via
``lax.fori_loop`` with carry-perturbed operands (CLAUDE.md timing
protocol).

Stages:
  intervals      fused_intervals_batched only
  +classify      intervals + _classify reductions
  +topk          intervals + classify + the visit-order select
  +expander      intervals + classify + select + ONE expander chunk
  full           safeopt_step (while_loop + query select)
"""

import _bootstrap  # noqa: F401  (sys.path for checkout runs)
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from safeopt_tpu import linearly_spaced_combinations
from safeopt_tpu.algorithms import safe_opt_core as core
from safeopt_tpu.config import with_matmul_precision
from safeopt_tpu.gp import GPRegression, RBF

rng = np.random.default_rng(0)
n_obs = 50
grid_np = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 1000)
X = rng.uniform(-1.5, 1.5, size=(n_obs, 2))
Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
      + 0.05 * rng.normal(size=n_obs))[:, None]
Yg = (1.0 - 0.1 * np.sum(X ** 2, axis=1)
      + 0.05 * rng.normal(size=n_obs))[:, None]
gp_f = GPRegression(X, Yf, RBF(2, variance=2.0, lengthscale=1.0),
                    noise_var=0.05 ** 2, capacity=64)
gp_g = GPRegression(X, Yg, RBF(2, variance=1.0, lengthscale=1.5),
                    noise_var=0.05 ** 2, capacity=64)

kernels = (gp_f.kern, gp_g.kern)
states = (gp_f.state, gp_g.state)
dtype = states[0].X.dtype
grid_dev = jnp.asarray(grid_np, dtype)
fmin = jnp.asarray([0.2, 0.5], dtype)
beta = jnp.asarray(2.0, dtype)
scaling = jnp.asarray([np.sqrt(2.0), 1.0], dtype)
threshold = jnp.asarray([0.0, 0.0], dtype)
N = grid_dev.shape[0]
CHUNK = 32


@with_matmul_precision
def stage(grid, upto):
    valid = jnp.ones((N,), bool)
    Q, mus, sigmas, Vs = core._confidence_intervals(
        kernels, states, grid, beta, use_pallas=True)
    if upto == "intervals":
        return jnp.max(Q), jnp.asarray(0, jnp.int32)
    S, M, cand, width, has_safe = core._classify(
        Q, fmin, scaling, threshold, beta, valid)
    if upto == "classify":
        return jnp.max(Q) + jnp.sum(M), jnp.sum(S)
    remaining, gidx, cvalid = core._next_chunk(cand, width, CHUNK)
    if upto == "topk":
        return jnp.max(Q) + jnp.sum(M) + jnp.sum(gidx), jnp.sum(S)
    pred = core._chunk_expander_predicate(
        kernels, states, grid, Q, valid & ~S, mus, sigmas, Vs, fmin, beta,
        None, gidx, cvalid, use_pallas=True)
    if upto == "expander":
        return (jnp.max(Q) + jnp.sum(M) + jnp.sum(gidx) + jnp.sum(pred),
                jnp.sum(S))
    raise ValueError(upto)


def full(grid, upto):
    r = core.safeopt_step(kernels, states, grid, fmin, beta, scaling,
                          threshold, chunk=CHUNK, use_pallas=True)
    return jnp.max(r.Q) + jnp.sum(r.diag).astype(dtype), r.next_idx


def timed(fn, upto, reps):
    @jax.jit
    def prog(g0):
        def body(i, carry):
            g, acc = carry
            v, s = fn(g, upto)
            acc = acc + v + s.astype(dtype)
            g = g + (acc % 2).astype(dtype) * 1e-12
            return g, acc
        _, acc = jax.lax.fori_loop(0, reps, body,
                                   (g0, jnp.zeros((), dtype)))
        return acc
    float(prog(grid_dev))                       # warmup/compile
    # distinct input per timed dispatch: the runtime elides duplicate
    # same-input dispatches entirely (CLAUDE.md)
    best = np.inf
    for j in range(1, 4):
        g = grid_dev * (1.0 + j * 1e-7)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        float(prog(g))              # actual device->host scalar pull
        best = min(best, time.perf_counter() - t0)
    return best


def per_call(fn, upto):
    t1 = timed(fn, upto, 1)
    t9 = timed(fn, upto, 9)
    ms = (t9 - t1) / 8 * 1e3
    print(f"{upto:12s} {ms:8.3f} ms   (t1={t1*1e3:7.2f}  t9={t9*1e3:7.2f})")
    return ms


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    for upto in ("intervals", "classify", "topk", "expander"):
        per_call(stage, upto)
    per_call(full, "full")
