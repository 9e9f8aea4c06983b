"""Round 3: prove WHERE the interval-stage residual lives.

Rounds 1-2 (bench_interval_mosaic*.py): every compiler-level knob —
dimension_semantics parallel/arbitrary, CostEstimate, raised
vmem_limit, block 256/1024 — is flat within +-5% (the round-1
"arbitrary -11%" did not reproduce over 3 rounds). Hypothesis: the
residual is the GRAM'S VPU TIME, which serializes with the MXU solve
inside each grid step (dataflow-dependent: the solve consumes the
gram; Mosaic pipelines DMAs across iterations, not block t+1's VPU
against block t's MXU).

Quantify with two kernel ablations, same specs/blocks as production:

  gram_only    computes the gram (d diffs/mults/adds + exp per
               element, the difference-form distances the precision
               invariants require) and emits its column sums —
               isolates the VPU time
  solve_only   feeds the whitened solve a gram-shaped broadcast
               (no per-element VPU math) — isolates the MXU time +
               fixed pipeline overheads

If gram_only + solve_only ~= total (the production kernel), the
serialization is proven and the residual is structural for the
difference-form gram (the x^2+z^2-2xz matmul form would move that
work to the MXU but loses exactly the small-distance precision the
decision invariants depend on — rejected by design, docs/design.md).
"""

import _bootstrap  # noqa: F401
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bench._wait_for_backend()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from safeopt_tpu import linearly_spaced_combinations
    from safeopt_tpu.ops.fused_posterior import (_fused_intervals_multi_impl,
                                                 _tri_matmul)

    print("device:", jax.devices()[0], flush=True)
    grid_np = np.asarray(linearly_spaced_combinations(
        [(-5.0, 5.0), (-5.0, 5.0)], 1000))
    gp_f, gp_g = bench._cap512_gps()
    kernels = (gp_f.kern, gp_g.kern)
    states = (gp_f.state, gp_g.state)
    dtype = jnp.float32
    d, cap, num_gps, block = 2, 512, 2, 512

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
    pad = (-n) % block
    zt = jnp.asarray(grid_np.T, dtype)
    if pad:
        zt = jnp.concatenate([zt, jnp.zeros((d, pad), dtype)], axis=1)

    def gram_block(g, zt_b, ils_ref, xs_ref, scal_ref):
        variance = scal_ref[g, 0]
        xsg = xs_ref[g]
        r2 = jnp.zeros((xsg.shape[0], zt_b.shape[1]), dtype)
        for k in range(d):
            diff = (xsg[:, k][:, None]
                    - (zt_b[k, :] * ils_ref[g, k])[None, :])
            r2 = r2 + diff * diff
        return variance * jnp.exp(-0.5 * r2)

    def kern_gram_only(zt_ref, ils_ref, xs_ref, lm_ref, w_ref, scal_ref,
                       out_ref):
        ztb = zt_ref[:]
        for g in range(num_gps):
            G = gram_block(g, ztb, ils_ref, xs_ref, scal_ref)
            out_ref[g, 0, :] = jnp.sum(G, axis=0)
            out_ref[g, 1, :] = jnp.sum(G * G, axis=0)

    def kern_solve_only(zt_ref, ils_ref, xs_ref, lm_ref, w_ref, scal_ref,
                        out_ref, three_pass):
        ztb = zt_ref[:]
        for g in range(num_gps):
            # gram-shaped rank-1 outer product: ONE mul per element
            # (vs the production gram's d diffs/mults/adds + exp); the
            # MXU solve and the emit epilogue run as in production.
            # (A broadcast_to stand-in SIGABRTs the Mosaic compiler:
            # 'Check failed: limits[i] <= dim(i) (16 vs. 1)'.)
            G = xs_ref[g][:, 0][:, None] * ztb[0][None, :]
            V = _tri_matmul(lm_ref[g], G, dtype, three_pass=three_pass)
            mu = jnp.sum(w_ref[g][:, None] * V, axis=0)
            var = jnp.maximum(scal_ref[g, 1] - jnp.sum(V * V, axis=0),
                              0.0)
            spread = scal_ref[g, 2] * jnp.sqrt(var)
            out_ref[g, 0, :] = mu - spread
            out_ref[g, 1, :] = mu + spread

    def build(body):
        @jax.jit
        def impl(zt, ils, xs, lm, w, scal):
            return pl.pallas_call(
                body,
                out_shape=jax.ShapeDtypeStruct((num_gps, 2, zt.shape[1]),
                                               dtype),
                grid=(zt.shape[1] // block,),
                in_specs=[
                    pl.BlockSpec((d, block), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((num_gps, d), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((num_gps, cap, d), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((num_gps, cap, cap),
                                 lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((num_gps, cap), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((num_gps, 4), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((num_gps, 2, block),
                                       lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM),
            )(zt, ils, xs, lm, w, scal)
        return impl

    def timed(callfn):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def prog(z0, *, reps):
            def body(i, carry):
                z, acc = carry
                out = callfn(z)
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

        return round((t(9) - t(1)) / 8 * 1e3, 3)

    gram_impl = build(kern_gram_only)
    out = {"gram_only_ms": timed(lambda z: gram_impl(
        z, ils, xs, lm, w, scal))}
    print("gram_only", out["gram_only_ms"], flush=True)
    for three_pass in (True, False):
        tag = "3pass" if three_pass else "6pass"
        solve_impl = build(functools.partial(kern_solve_only,
                                             three_pass=three_pass))
        out[f"{tag}_solve_only_ms"] = timed(
            lambda z: solve_impl(z, ils, xs, lm, w, scal))
        out[f"{tag}_total_ms"] = timed(
            lambda z: _fused_intervals_multi_impl(
                z, ils, xs, lm, w, scal, kind="rbf", block=block,
                num_gps=num_gps, three_pass=three_pass))
        s = out["gram_only_ms"] + out[f"{tag}_solve_only_ms"]
        out[f"{tag}_sum_vs_total"] = round(
            s / out[f"{tag}_total_ms"], 3)
        print(tag, "solve_only", out[f"{tag}_solve_only_ms"],
              "total", out[f"{tag}_total_ms"],
              "gram+solve/total", out[f"{tag}_sum_vs_total"], flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
