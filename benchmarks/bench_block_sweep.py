"""Block-size sweep for the production fused interval kernels.

bench_pergp_bisect measured block 1024 at 5.8 ms vs the default 512 at
6.9 ms (single GP, cap=512, 6-pass). This sweeps the PRODUCTION entry
points (fused_intervals / fused_intervals_batched) across block sizes
at the two shipped capacities, both precisions, checking each result
bit-exact against the block-512 run — the block size only re-tiles the
same arithmetic, so any deviation is a kernel bug, not rounding.

Timing protocol (CLAUDE.md): reps chained inside one jit via
lax.fori_loop with carry-perturbed operands, full result consumed,
difference reps=1 vs reps=9.
"""

import _bootstrap  # noqa: F401
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

from safeopt_tpu import linearly_spaced_combinations
from safeopt_tpu.config import MATMUL_PRECISION
from safeopt_tpu.gp import GPRegression, RBF
from safeopt_tpu.ops.fused_posterior import fused_intervals_batched


def build(cap, n_obs):
    rng = np.random.default_rng(0)
    X = rng.uniform(-4.0, 4.0, size=(n_obs, 2))
    Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
          + 0.05 * rng.normal(size=n_obs))[:, None]
    Yg = (1.0 - 0.1 * np.sum(X ** 2, axis=1)
          + 0.05 * rng.normal(size=n_obs))[:, None]
    gp_f = GPRegression(X, Yf, RBF(2, variance=2.0, lengthscale=1.0),
                        noise_var=0.05 ** 2, capacity=cap)
    gp_g = GPRegression(X, Yg, RBF(2, variance=1.0, lengthscale=1.5),
                        noise_var=0.05 ** 2, capacity=cap)
    return (gp_f.kern, gp_g.kern), (gp_f.state, gp_g.state)


def main():
    bench._wait_for_backend()
    print("device:", jax.devices()[0], flush=True)
    grid = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 1000)
    grid_dev = jnp.asarray(grid, jnp.float32)
    beta = jnp.asarray(2.0, jnp.float32)
    out = {}

    for cap, n_obs, blocks in ((512, 500, (512, 1024, 1536)),
                               (256, 250, (1536, 2048, 2560))):
        kernels, states = build(cap, n_obs)

        def prog_fn(block, three_pass):
            @jax.jit
            def prog(g0, reps):
                def body(i, carry):
                    b, acc = carry
                    with jax.default_matmul_precision(MATMUL_PRECISION):
                        tot = jnp.zeros((), jnp.float32)
                        for l, u in fused_intervals_batched(
                                kernels, states, grid_dev * b, beta,
                                block=block, three_pass=three_pass):
                            tot = tot + jnp.max(u) + jnp.min(l)
                    return b + (tot % 2) * 1e-9, acc + tot
                return jax.lax.fori_loop(
                    0, reps, body, (g0, jnp.zeros((), jnp.float32)))[1]
            return prog

        def q_at(block, three_pass):
            cols = []
            with jax.default_matmul_precision(MATMUL_PRECISION):
                for l, u in fused_intervals_batched(
                        kernels, states, grid_dev, beta, block=block,
                        three_pass=three_pass):
                    cols.extend([l, u])
            return jnp.stack(cols, axis=1)

        for tp in (False, True):
            tag = "3p" if tp else "6p"
            ref_q = None
            for block in blocks:
                key = f"cap{cap}_{tag}_b{block}"
                try:
                    q = jax.jit(lambda b=block, t=tp: q_at(b, t))()
                    q = np.asarray(q)
                    if ref_q is None:
                        ref_q = q
                        exact = True
                    else:
                        exact = bool(np.array_equal(q, ref_q))
                    prog = prog_fn(block, tp)
                    one = jnp.asarray(1.0, jnp.float32)
                    float(prog(one, 1))
                    t0 = time.perf_counter()
                    float(prog(one * (1 + 1e-9), 1))
                    t1 = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    float(prog(one * (1 + 2e-9), 9))
                    t9 = time.perf_counter() - t0
                    ms = (t9 - t1) / 8 * 1e3
                    out[key] = round(ms, 3)
                    out[key + "_exact"] = exact
                    print(f"{key:18s} {ms:8.3f} ms  exact={exact}",
                          flush=True)
                except Exception as e:  # pragma: no cover - probe
                    out[key] = f"fail: {type(e).__name__}"
                    print(f"{key:18s} FAILED {type(e).__name__}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
