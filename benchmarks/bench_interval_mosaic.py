"""Mosaic-level experiments on the cap512 interval-stage residual.

VERDICT r4 #3: the 3-pass interval stage reads ~13.4 ms against a
~10.0 ms analytic MXU floor and the round-4 explanation was a label
("layout/pipeline overhead"), not a mechanism. This script pins it
with compiler-level experiments on the PRODUCTION batched kernel body
(`_interval_kernel_multi` — the experiments re-wrap the same body with
varied `pltpu.CompilerParams`; the shipped wrapper is untouched until
a win is proven and bit-checked):

  base        the shipped `_fused_intervals_multi_impl`
  parallel    dimension_semantics=("parallel",) — tells Mosaic the
              grid-block iterations are independent (they are: each
              writes its own output block), unlocking cross-iteration
              scheduling/DMA freedom
  arbitrary   dimension_semantics=("arbitrary",) — the explicit
              sequential baseline (isolates the flag's effect from
              run-to-run noise)
  cost        pl.CostEstimate with the true FLOPs/bytes/
              transcendentals — scheduling hint only
  vmem100     vmem_limit_bytes=100 MB — lets Mosaic hold deeper
              input-pipeline buffers than the default scoped limit
  vmem+b1024  the same raised limit re-testing block=1024 (round 4's
              sweep rejected 1024 under the DEFAULT limit)

Every variant is bit-checked against base. Timing protocol
(CLAUDE.md): reps chained inside one jit via lax.fori_loop with the
grid perturbed from the carry, whole output consumed via jnp.max,
difference reps=1 vs 9, best of 3.

Hypothesis for the residual if all read flat: within one grid step the
gram (VPU: d diffs/mults + transcendental per element) and the
whitened solve (MXU) are data-dependent and serialize; Mosaic
pipelines DMAs across iterations but not block t+1's VPU against
block t's MXU. The gram at cap512 x 1e6 x 2 GPs is ~1e9 VPU
elements — milliseconds of VPU time that adds to, rather than hides
under, the MXU passes.
"""

import _bootstrap  # noqa: F401
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def _variant_impl(compiler_params=None, cost=None, block=512):
    """Re-wrap the production kernel body with experiment params."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from safeopt_tpu.ops.fused_posterior import _interval_kernel_multi

    @functools.partial(jax.jit, static_argnames=("kind", "num_gps",
                                                 "group_size",
                                                 "three_pass"))
    def impl(zt, ils, xs, lm, w, scal, *, kind, num_gps,
             group_size=1, three_pass=False):
        d, n = zt.shape
        cap = xs.shape[1]
        nfac, R = lm.shape[0], lm.shape[1]
        kw = {}
        if compiler_params is not None:
            kw["compiler_params"] = compiler_params
        if cost is not None:
            kw["cost_estimate"] = cost
        return pl.pallas_call(
            functools.partial(_interval_kernel_multi, kind=kind,
                              num_gps=num_gps, group_size=group_size,
                              three_pass=three_pass),
            out_shape=jax.ShapeDtypeStruct((num_gps, 2, n), zt.dtype),
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec((d, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_gps, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_gps, cap, d), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nfac, R, R), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_gps, cap), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_gps, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((num_gps, 2, block),
                                   lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            **kw,
        )(zt, ils, xs, lm, w, scal)

    return impl


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
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
    d = 2
    cap = 512
    num_gps = 2

    # operand assembly exactly as fused_intervals_batched does
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
    ils = jnp.stack(ils_rows)
    xs = jnp.stack(xs_rows)
    lm = jnp.stack(lm_rows)
    w = jnp.stack(w_rows)
    scal = jnp.stack(scal_rows)

    n = grid_np.shape[0]

    def operands(block):
        pad = (-n) % block
        zt = jnp.asarray(grid_np.T, dtype)
        if pad:
            zt = jnp.concatenate(
                [zt, jnp.zeros((d, pad), dtype)], axis=1)
        return zt

    def timed(impl, zt, three_pass):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def prog(z0, *, reps):
            def body(i, carry):
                z, acc = carry
                out = impl(z, ils, xs, lm, w, scal, kind="rbf",
                           num_gps=num_gps, three_pass=three_pass)
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

    flops = 2 * num_gps * (10 / 16) * cap * cap * n
    cost = pl.CostEstimate(
        flops=int(flops),
        bytes_accessed=int(4 * (n * d + num_gps * (cap * cap + 2 * n))),
        transcendentals=int(num_gps * cap * n))

    variants = [
        ("base", _fused_intervals_multi_impl, 512),
        ("parallel", _variant_impl(pltpu.CompilerParams(
            dimension_semantics=("parallel",)), block=512), 512),
        ("arbitrary", _variant_impl(pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)), block=512), 512),
        ("cost", _variant_impl(cost=cost, block=512), 512),
        ("vmem100", _variant_impl(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024), block=512), 512),
        ("vmem100_b1024", _variant_impl(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024), block=1024), 1024),
    ]

    out = {}
    for three_pass in (True, False):
        tag = "3pass" if three_pass else "6pass"
        zt = operands(512)
        ref = None
        for name, impl, block in variants:
            ztb = operands(block)
            try:
                if name == "base":
                    res = impl(ztb, ils, xs, lm, w, scal, kind="rbf",
                               block=block, num_gps=num_gps,
                               three_pass=three_pass)
                else:
                    res = impl(ztb, ils, xs, lm, w, scal, kind="rbf",
                               num_gps=num_gps, three_pass=three_pass)
                res = np.asarray(res)[:, :, :n]
                if ref is None:
                    ref = res
                bit = bool(np.array_equal(res, ref))
                if name == "base":
                    ms = timed(lambda z, i, x, l, ww, s, **kw: impl(
                        z, i, x, l, ww, s, block=block, **kw),
                        ztb, three_pass)
                else:
                    ms = timed(impl, ztb, three_pass)
                out[f"{tag}_{name}_ms"] = round(ms, 3)
                out[f"{tag}_{name}_bitexact"] = bit
                print(f"{tag:6s} {name:14s} {ms:7.3f} ms  bitexact={bit}",
                      flush=True)
            except Exception as e:
                out[f"{tag}_{name}_error"] = f"{type(e).__name__}: {e}"
                print(f"{tag:6s} {name:14s} ERROR {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
