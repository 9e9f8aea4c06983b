"""Bisect the 2x gap: production fused_intervals vs the minimal
single-GP harness kernel (bench_interval_variants), SAME operands,
SAME timing protocol, one GP (the bench gp_f), 3-pass.

Steps between the two, each isolating one difference:
  prod        production fused_intervals(gp_f) as-is (block auto=512)
  prod_b1024  production with block=1024
  prod_pre    production with zt/xs/lm/scal precomputed OUTSIDE the
              timed loop (the wrapper's per-call grid divide/transpose
              and factor mask+split excluded) -> calls the impl direct
  minimal     the harness kernel (inline RBF, pre-split lm), b512
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
from safeopt_tpu.ops.fused_posterior import (_fused_intervals_impl,
                                             _split_hi_lo, fused_intervals)
from benchmarks.bench_interval_variants import run_kernel


def main():
    rng = np.random.default_rng(0)
    n_obs, cap = 500, 512
    X = rng.uniform(-4.0, 4.0, size=(n_obs, 2))
    Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
          + 0.05 * rng.normal(size=n_obs))[:, None]
    gp = GPRegression(X, Yf, RBF(2, variance=2.0, lengthscale=1.0),
                      noise_var=0.05 ** 2, capacity=cap)
    st = gp.state
    dtype = st.X.dtype
    grid_np = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)],
                                           1000)
    grid = jnp.asarray(grid_np, dtype)
    beta = jnp.asarray(2.0, dtype)

    # precomputed operands (features-first, padded, pre-split factor)
    block = 512
    zt = grid.T
    pad = (-zt.shape[1]) % block
    if pad:
        zt = jnp.concatenate(
            [zt, jnp.zeros((zt.shape[0], pad), dtype)], axis=1)
    mask = (jnp.arange(cap) < st.count).astype(dtype)
    lm2 = jnp.stack(_split_hi_lo(st.Linv * mask[None, :], dtype))
    xs = st.X
    w_row = st.w[None, :]
    scal4 = jnp.asarray([[0.0, 2.0, 2.0, 0.0]], dtype)
    scal_min = jnp.asarray([[2.0, 2.0, 2.0, 0.0]], dtype)
    scales = jnp.ones((1, 2), dtype)
    pvars = jnp.asarray([[2.0]], dtype)
    kinds = (("rbf",),)

    variants = {
        "prod": lambda g: fused_intervals(gp.kern, st, g, beta,
                                          three_pass=True)[0],
        "prod_b1024": lambda g: fused_intervals(gp.kern, st, g, beta,
                                                block=1024,
                                                three_pass=True)[0],
    }

    def prod_pre(z):
        out = _fused_intervals_impl(z, xs, lm2, w_row, scales, pvars,
                                    scal4, kinds=kinds, block=block,
                                    prescaled=True, three_pass=True)
        return out[0]

    def minimal(z):
        return run_kernel(z, xs, lm2, w_row, scal_min,
                          variant="hoisted", block=block)[0]

    out = {"device": str(jax.devices()[0].device_kind)}

    def timed(name, fn, operand):
        @jax.jit
        def prog(z0, reps):
            def body(i, carry):
                z, a = carry
                a = a + jnp.max(fn(z))
                return z * (1.0 + 1e-9) + (a % 2) * 1e-9, a
            return jax.lax.fori_loop(0, reps, body,
                                     (z0, jnp.zeros((), dtype)))[1]

        r1, r9 = jnp.asarray(1), jnp.asarray(9)
        float(prog(operand, r1)); float(prog(operand, r9))
        best = np.inf
        for j in range(1, 4):
            g = operand * (1.0 + j * 1e-7)
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            float(prog(g, r1))
            t1 = time.perf_counter()
            float(prog(g * (1 + 1e-8), r9))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / 8)
        out[f"{name}_ms"] = round(best * 1e3, 3)
        print(f"{name}_ms: {out[f'{name}_ms']}", flush=True)

    for name, fn in variants.items():
        timed(name, fn, grid)
    timed("prod_pre", prod_pre, zt)
    timed("minimal", minimal, zt)

    # parity guard: production and minimal agree on the same operands
    lp = fused_intervals(gp.kern, st, grid, beta, three_pass=True)[0]
    lh = minimal(zt)[: grid.shape[0]]
    out["max_delta"] = float(jnp.max(jnp.abs(lp - lh)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
