"""Replicate bench.py's flagship_device_ms protocol verbatim.

bench_flagship_stages.py (beta perturbed from the carry, grid fixed)
measured the full step at ~2.0 ms while BENCH_FULL.json's
flagship_device_ms (grid scaled by the carry) recorded 3.93 ms. This
script runs BOTH perturbation variants back to back in one process to
decide whether the gap is protocol (the grid multiply re-materializes
an 8 MB operand and defeats cross-rep reuse) or tunnel-day state.
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
from safeopt_tpu.algorithms.safe_opt_core import safeopt_step
from safeopt_tpu.gp import GPRegression, RBF

rng = np.random.default_rng(0)
n_obs = 50
grid = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 1000)
X = rng.uniform(-4.0, 4.0, size=(n_obs, 2))
Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
      + 0.05 * rng.normal(size=n_obs))[:, None]
Yg = (1.0 - 0.1 * np.sum(X ** 2, axis=1)
      + 0.05 * rng.normal(size=n_obs))[:, None]
gp_f = GPRegression(X, Yf, RBF(2, variance=2.0, lengthscale=1.0),
                    noise_var=0.05 ** 2, capacity=64)
gp_g = GPRegression(X, Yg, RBF(2, variance=1.5, lengthscale=1.5),
                    noise_var=0.05 ** 2, capacity=64)
kernels = (gp_f.kern, gp_g.kern)
states = (gp_f.state, gp_g.state)
dtype = states[0].X.dtype
grid_dev = jnp.asarray(grid, dtype)
fmin = jnp.asarray([0.2, 0.5], dtype)
beta = jnp.asarray(2.0, dtype)
scaling = jnp.asarray([np.sqrt(2.0), 1.0], dtype)
threshold = jnp.asarray([0.0, 0.0], dtype)


def consumed(r):
    return (r.next_idx.astype(jnp.float32)
            + r.safe_count.astype(jnp.float32)
            + r.maximizer_count.astype(jnp.float32)
            + jnp.max(r.Q))


def chained_grid(g0, reps):
    """bench.py's exact body: grid scaled by the carry."""
    def body(i, carry):
        b, acc = carry
        r = safeopt_step(kernels, states, grid_dev * b, fmin, beta,
                         scaling, threshold, chunk=32, use_pallas=True)
        tot = consumed(r)
        return b + (tot % 2) * 1e-12, acc + tot
    return jax.lax.fori_loop(0, reps, body,
                             (g0, jnp.zeros((), jnp.float32)))[1]


def chained_beta(g0, reps):
    """beta perturbed from the carry, grid untouched."""
    def body(i, carry):
        b, acc = carry
        r = safeopt_step(kernels, states, grid_dev, fmin, beta * b,
                         scaling, threshold, chunk=32, use_pallas=True)
        tot = consumed(r)
        return b + (tot % 2) * 1e-12, acc + tot
    return jax.lax.fori_loop(0, reps, body,
                             (g0, jnp.zeros((), jnp.float32)))[1]


def measure(fn, label):
    j = jax.jit(fn, static_argnames=("reps",))
    one = jnp.asarray(1.0, dtype)
    float(j(one, 1))
    float(j(one, 11))
    t1s, t11s = [], []
    for k in range(3):
        t0 = time.perf_counter()
        float(j(one * (1 + 1e-9 * (2 * k + 1)), 1))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(j(one * (1 + 1e-9 * (2 * k + 2)), 11))
        t11s.append(time.perf_counter() - t0)
    ms = (min(t11s) - min(t1s)) / 10 * 1e3
    print(f"{label:12s} {ms:7.3f} ms  (t1 {min(t1s)*1e3:6.1f}  "
          f"t11 {min(t11s)*1e3:6.1f})", flush=True)
    return ms


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    out = {
        "grid_perturbed_ms": round(measure(chained_grid, "grid-pert"), 3),
        "beta_perturbed_ms": round(measure(chained_beta, "beta-pert"), 3),
    }
    print(json.dumps(out))
