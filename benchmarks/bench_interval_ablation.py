"""Floor ablation of the cap512 3-pass fused interval kernel.

Completes the stage table in docs/design.md: the 3-pass interval pass
measures 14.2 ms against a ~10 ms analytic MXU bound — this script
measures where the remainder lives by ablating the kernel body:

  full       gram -> hi/lo splits -> 3-pass tri matmul -> mu/var/beta
  no_mxu     V := kmat (matmul + splits removed; gram + epilogue only)
  epilogue   V := broadcast row    (gram also removed; epilogue + HBM)
  mxu_raw    one raw 3-pass (cap,cap)x(cap,B) dot, no kernel around it

full - no_mxu  = the MXU + split share;  no_mxu - epilogue = gram VPU;
epilogue       = reductions + interval arithmetic + grid/output HBM.

Timing protocol per CLAUDE.md (reps inside one jit, perturbed carry,
consume everything, diff reps 1 vs 9).
"""

import _bootstrap  # noqa: F401
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from safeopt_tpu import linearly_spaced_combinations
from safeopt_tpu.gp import GPRegression, RBF
from safeopt_tpu.ops.fused_posterior import _pick_block, _tri_matmul

rng = np.random.default_rng(0)
n_obs, cap = 500, 512
grid_np = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 1000)
X = rng.uniform(-4.0, 4.0, size=(n_obs, 2))
Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
      + 0.05 * rng.normal(size=n_obs))[:, None]
gp = GPRegression(X, Yf, RBF(2, variance=2.0, lengthscale=1.0),
                  noise_var=0.05 ** 2, capacity=cap)
dtype = gp.state.X.dtype
NUM_GPS = 2     # the stage bench runs 2 GPs; emulate by doubling reps


def _kernel(zt_ref, xs_ref, lm_ref, w_ref, scal_ref, out_ref, *,
            variant: str):
    zt = zt_ref[:]
    xs = xs_ref[:]
    lm = lm_ref[:]
    w = w_ref[:]
    acc = zt.dtype
    kdiag = scal_ref[0, 1]
    beta = scal_ref[0, 2]
    d = zt.shape[0]

    if variant == "epilogue":
        V = jnp.broadcast_to(zt[0][None, :] * 0.01,
                             (xs.shape[0], zt.shape[1]))
    else:
        r2 = jnp.zeros((xs.shape[0], zt.shape[1]), acc)
        for k in range(d):
            diff = xs[:, k][:, None] - zt[k, :][None, :]
            r2 = r2 + diff * diff
        kmat = scal_ref[0, 0] * jnp.exp(-0.5 * r2)
        if variant == "no_mxu":
            V = kmat
        else:
            V = _tri_matmul(lm, kmat, acc, three_pass=True)

    mu = jnp.sum(w[0][:, None] * V, axis=0)
    var = jnp.maximum(kdiag - jnp.sum(V * V, axis=0), 0.0)
    spread = beta * jnp.sqrt(var)
    out_ref[0, :] = mu - spread
    out_ref[1, :] = mu + spread


@functools.partial(jax.jit, static_argnames=("variant", "block"))
def run_kernel(zt, xs, lm, w_row, scal, *, variant: str, block: int):
    d, n = zt.shape
    c = xs.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((2, n), zt.dtype),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((d, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(zt, xs, lm, w_row, scal)


BLOCK = _pick_block(cap)
ls = 1.0
zt_full = jnp.asarray(grid_np.T / ls, dtype)
pad = (-zt_full.shape[1]) % BLOCK
if pad:
    zt_full = jnp.concatenate(
        [zt_full, jnp.zeros((zt_full.shape[0], pad), dtype)], axis=1)
xs = jnp.asarray(np.asarray(gp.state.X) / ls, dtype)
mask = (jnp.arange(cap) < gp.state.count).astype(dtype)
lm = gp.state.Linv * mask[None, :]
w_row = gp.state.w[None, :]
scal = jnp.asarray([[2.0, 2.0, 2.0, 0.0]], dtype)


def timed(variant, reps):
    @jax.jit
    def prog(z0):
        def body(i, carry):
            z, acc = carry
            # 2 GPs' worth of work, like the stage bench
            o1 = run_kernel(z, xs, lm, w_row, scal, variant=variant,
                            block=BLOCK)
            o2 = run_kernel(z * (1 + 1e-9), xs, lm, w_row, scal,
                            variant=variant, block=BLOCK)
            acc = acc + jnp.max(o1) + jnp.max(o2)
            return z + (acc % 2).astype(dtype) * 1e-9, acc
        return jax.lax.fori_loop(0, reps, body,
                                 (z0, jnp.zeros((), dtype)))[1]

    float(prog(zt_full))
    best = np.inf
    for j in range(1, 4):
        g = zt_full * (1.0 + j * 1e-7)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        float(prog(g))
        best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    out = {}
    for variant in ("full", "no_mxu", "epilogue"):
        t1, t9 = timed(variant, 1), timed(variant, 9)
        ms = (t9 - t1) / 8 * 1e3
        out[variant] = round(ms, 3)
        print(f"{variant:10s} {ms:8.3f} ms (2 GPs)", flush=True)
    out["mxu_plus_splits"] = round(out["full"] - out["no_mxu"], 3)
    out["gram_vpu"] = round(out["no_mxu"] - out["epilogue"], 3)
    print(json.dumps(out))
