"""A/B: the multi-GP batched interval kernel vs one fused pass per GP.

The cap512 certified stage table (docs/design.md) puts the 2-GP 3-pass
interval stage at 14.2 ms, but a minimal single-GP harness
(bench_interval_variants.py) runs TWO cap512 single-GP passes in
~6.8 ms — suggesting the batched-kernel wrapper itself (shared grid
pass, 2x factor blocks resident in VMEM) is the gap, not the math.
This times the two PRODUCTION entry points on identical operands.
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
from safeopt_tpu.gp import GPRegression, RBF
from safeopt_tpu.ops.fused_posterior import (fused_intervals,
                                             fused_intervals_batched)


def _gps():
    rng = np.random.default_rng(0)
    n_obs, cap = 500, 512
    X = rng.uniform(-4.0, 4.0, size=(n_obs, 2))
    Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
          + 0.05 * rng.normal(size=n_obs))[:, None]
    Yg = (1.0 - 0.1 * np.sum(X ** 2, axis=1)
          + 0.05 * rng.normal(size=n_obs))[:, None]
    gp_f = GPRegression(X, Yf, RBF(2, variance=2.0, lengthscale=1.0),
                        noise_var=0.05 ** 2, capacity=cap)
    gp_g = GPRegression(X, Yg, RBF(2, variance=1.0, lengthscale=1.5),
                        noise_var=0.05 ** 2, capacity=cap)
    return gp_f, gp_g


def main():
    gp_f, gp_g = _gps()
    kernels = (gp_f.kern, gp_g.kern)
    states = (gp_f.state, gp_g.state)
    grid_np = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)],
                                           1000)
    dtype = states[0].X.dtype
    grid = jnp.asarray(grid_np, dtype)
    beta = jnp.asarray(2.0, dtype)

    def batched(g, three_pass):
        rows = fused_intervals_batched(kernels, states, g, beta,
                                       three_pass=three_pass)
        return sum(jnp.max(l) + jnp.max(u) for l, u in rows)

    def pergp(g, three_pass):
        acc = jnp.zeros((), dtype)
        for kern, st in zip(kernels, states):
            l, u = fused_intervals(kern, st, g, beta,
                                   three_pass=three_pass)
            acc = acc + jnp.max(l) + jnp.max(u)
        return acc

    out = {"device": str(jax.devices()[0].device_kind)}
    for name, fn in (("batched", batched), ("pergp", pergp)):
        for tp in (True, False):
            @jax.jit
            def prog(z0, reps, fn=fn, tp=tp):
                def body(i, carry):
                    z, a = carry
                    a = a + fn(z, tp)
                    return z * (1.0 + 1e-9) + (a % 2) * 1e-9, a
                return jax.lax.fori_loop(0, reps, body,
                                         (z0, jnp.zeros((), dtype)))[1]

            reps1 = jnp.asarray(1)
            reps9 = jnp.asarray(9)
            float(prog(grid, reps1))
            float(prog(grid, reps9))
            best = np.inf
            for j in range(1, 4):
                g = grid * (1.0 + j * 1e-7)
                jax.block_until_ready(g)
                t0 = time.perf_counter()
                a = float(prog(g, reps1))
                t1 = time.perf_counter()
                b = float(prog(g * (1 + 1e-8), reps9))
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0)) / 8)
                assert np.isfinite(a) and np.isfinite(b)
            key = f"{name}_{'3pass' if tp else '6pass'}_ms"
            out[key] = round(best * 1e3, 3)
            print(f"{key}: {out[key]}", flush=True)

    # parity: identical rows from both entry points
    rb = fused_intervals_batched(kernels, states, grid, beta,
                                 three_pass=True)
    rp = [fused_intervals(k, s, grid, beta, three_pass=True)
          for k, s in zip(kernels, states)]
    deltas = [float(jnp.max(jnp.abs(a - b)))
              for (l1, u1), (l2, u2) in zip(rb, rp)
              for a, b in ((l1, l2), (u1, u2))]
    out["max_delta_3pass"] = max(deltas)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
