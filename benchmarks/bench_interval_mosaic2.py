"""Round 2 of the Mosaic interval experiments: confirm the `arbitrary`
dimension-semantics win with repeats and test its combinations.

Round 1 read (cap512, 2 GP): 3-pass base 13.87 ms vs EXPLICIT
dimension_semantics=("arbitrary",) 12.30 ms (-11%), "parallel" worse,
cost/vmem flat. Surprising (unset should default to arbitrary), so:
3 independent timing rounds per variant, plus arbitrary+vmem100 and
arbitrary at block 1024.
"""

import _bootstrap  # noqa: F401
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from bench_interval_mosaic import _variant_impl  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    bench._wait_for_backend()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from safeopt_tpu import linearly_spaced_combinations
    from safeopt_tpu.ops.fused_posterior import _fused_intervals_multi_impl

    print("device:", jax.devices()[0], flush=True)
    grid_np = np.asarray(linearly_spaced_combinations(
        [(-5.0, 5.0), (-5.0, 5.0)], 1000))
    gp_f, gp_g = bench._cap512_gps()
    kernels = (gp_f.kern, gp_g.kern)
    states = (gp_f.state, gp_g.state)
    dtype = jnp.float32
    d, cap, num_gps = 2, 512, 2

    ils_rows, xs_rows, lm_rows, w_rows, scal_rows = [], [], [], [], []
    for kern, st in zip(kernels, states):
        ls = jnp.broadcast_to(jnp.asarray(kern.lengthscale, dtype), (d,))
        ils_rows.append(1.0 / ls)
        xs_rows.append(st.X / ls)
        mask = (jnp.arange(cap) < st.count).astype(dtype)
        lm_rows.append(st.Linv * mask[None, :])
        w_rows.append(st.w)
        scal_rows.append(jnp.stack([
            jnp.asarray(kern.variance, dtype),
            jnp.asarray(kern.variance, dtype),
            jnp.asarray(2.0, dtype),
            jnp.zeros((), dtype)]))
    ils, xs, lm, w, scal = (jnp.stack(v) for v in
                            (ils_rows, xs_rows, lm_rows, w_rows,
                             scal_rows))
    n = grid_np.shape[0]

    def operands(block):
        pad = (-n) % block
        zt = jnp.asarray(grid_np.T, dtype)
        if pad:
            zt = jnp.concatenate(
                [zt, jnp.zeros((d, pad), dtype)], axis=1)
        return zt

    def timed_once(impl, zt, three_pass, base=False):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def prog(z0, *, reps):
            def body(i, carry):
                z, acc = carry
                kw = dict(kind="rbf", num_gps=num_gps,
                          three_pass=three_pass)
                if base:
                    kw["block"] = 512
                out = impl(z, ils, xs, lm, w, scal, **kw)
                acc = acc + jnp.max(out)
                return z + (acc % 2.0) * 1e-12, acc
            return jax.lax.fori_loop(0, reps, body,
                                     (z0, jnp.float32(0.0)))[1]

        def t(reps):
            float(prog(zt, reps=reps))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(prog(zt * (1 + 1e-9), reps=reps))
                best = min(best, time.perf_counter() - t0)
            return best

        return (t(9) - t(1)) / 8 * 1e3

    arb = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    arb_v100 = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024)
    variants = [
        ("base", _fused_intervals_multi_impl, 512, True),
        ("arbitrary", _variant_impl(arb, block=512), 512, False),
        ("arb_vmem100", _variant_impl(arb_v100, block=512), 512, False),
        ("arb_b1024", _variant_impl(arb_v100, block=1024), 1024, False),
        ("arb_b256", _variant_impl(arb, block=256), 256, False),
    ]

    out = {}
    for three_pass in (True, False):
        tag = "3pass" if three_pass else "6pass"
        for name, impl, block, is_base in variants:
            zt = operands(block)
            rounds = [round(timed_once(impl, zt, three_pass,
                                       base=is_base), 3)
                      for _ in range(3)]
            out[f"{tag}_{name}_ms_rounds"] = rounds
            print(f"{tag:6s} {name:12s} {rounds}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
