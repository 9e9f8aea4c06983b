"""Pallas TPU kernel: fused grid posterior + confidence intervals.

The XLA formulation of the grid posterior materializes two (capacity,
N) intermediates in HBM per GP — the cross-gram ``K(X, grid)`` and the
whitened solve ``V = Linv @ K`` — roughly ``2 * cap * N * 4`` bytes of
round-trip traffic per GP per iteration (512 MB at cap=64, N=1e6,
times read+write). This kernel streams the grid once: each block
computes its gram tile, the triangular-inverse matmul, the mean /
variance reductions and the beta-interval arithmetic entirely in VMEM,
writing only the (N, 2) interval columns.

    per grid block zb (B, d):
        r2   = |zb/ls|^2 + |xs|^2 - 2 (zb/ls) xs^T      (MXU)
        kmat = kfun(r2)                                  (VPU)
        V    = kmat @ Lm^T                               (MXU)
        mu   = V @ w
        var  = kdiag - rowsum(V^2)
        out  = [mu - beta*sqrt(var), mu + beta*sqrt(var)]

``Lm = Linv * row_mask`` is pre-masked so padded factor rows vanish
without an in-kernel mask; ``xs = X / lengthscale`` is pre-scaled so
ARD costs nothing per block. Supported for the stationary single
kernels (RBF, Matern-3/2) that dominate real workloads; product /
context kernels fall back to the XLA path automatically.

Accumulation note: the gram cross term and the V matmul use
``preferred_element_type=float32`` so the MXU accumulates in f32
regardless of input precision.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..gp.kernels import RBF, Matern32

__all__ = ["fused_intervals", "supports_kernel"]


def supports_kernel(kernel) -> bool:
    """True when the Pallas path can handle this kernel."""
    return isinstance(kernel, (RBF, Matern32)) and kernel.active_dims == \
        tuple(range(kernel.input_dim))


def _interval_kernel(zs_ref, xs_ref, lm_ref, w_ref, scal_ref, out_ref,
                     *, kind: str, block: int):
    """One grid block: gram tile -> whitened solve -> intervals."""
    import jax.lax as lax

    zs = zs_ref[:]                      # (B, d) pre-scaled grid block
    xs = xs_ref[:]                      # (cap, d) pre-scaled data
    lm = lm_ref[:]                      # (cap, cap) masked Linv
    w = w_ref[:]                        # (1, cap) whitened targets
    acc = zs.dtype                      # f32 accum on TPU; f64 in x64 tests

    variance = scal_ref[0, 0]
    kdiag = scal_ref[0, 1]
    noise_beta = scal_ref[0, 2]         # beta
    # scaled squared distances: the cross term rides the MXU
    zn = jnp.sum(zs * zs, axis=1, keepdims=True)          # (B, 1)
    xn = jnp.sum(xs * xs, axis=1, keepdims=True)          # (cap, 1)
    cross = jax.lax.dot_general(
        zs, xs, (((1,), (1,)), ((), ())),
        preferred_element_type=acc)                       # (B, cap)
    r2 = jnp.maximum(zn + xn.T - 2.0 * cross, 0.0)

    if kind == "rbf":
        kmat = variance * jnp.exp(-0.5 * r2)
    else:  # matern32
        r = jnp.sqrt(r2 + 1e-36)
        s3r = jnp.sqrt(jnp.asarray(3.0, acc)) * r
        kmat = variance * (1.0 + s3r) * jnp.exp(-s3r)

    # V = kmat @ Lm^T : (B, cap) x (cap, cap)
    V = jax.lax.dot_general(
        kmat, lm, (((1,), (1,)), ((), ())),
        preferred_element_type=acc)

    mu = jax.lax.dot_general(
        V, w, (((1,), (1,)), ((), ())),
        preferred_element_type=acc)[:, 0]                 # (B,)
    var = jnp.maximum(kdiag - jnp.sum(V * V, axis=1), 0.0)
    spread = noise_beta * jnp.sqrt(var)
    out_ref[:, 0] = mu - spread
    out_ref[:, 1] = mu + spread


@functools.partial(jax.jit, static_argnames=("kind", "block"))
def _fused_intervals_impl(zs, xs, lm, w_row, scal, *, kind: str, block: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = zs.shape[0]
    d = zs.shape[1]
    cap = xs.shape[0]
    grid = (n // block,)

    # Interpret mode keeps the kernel testable on the CPU mesh used by
    # the test suite; compiled Mosaic path on real TPUs.
    interpret = jax.default_backend() == "cpu"

    return pl.pallas_call(
        functools.partial(_interval_kernel, kind=kind, block=block),
        out_shape=jax.ShapeDtypeStruct((n, 2), zs.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(zs, xs, lm, w_row, scal)


def fused_intervals(kernel, state, grid: jnp.ndarray, beta,
                    block: int = 2048) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(l, u) interval columns for one GP over the grid, fused.

    Pads the grid to a block multiple; callers slice the result. Falls
    back to raising for unsupported kernels — guard with
    ``supports_kernel``.
    """
    if not supports_kernel(kernel):
        raise TypeError(f"unsupported kernel for the fused path: {kernel!r}")

    dtype = grid.dtype
    n = grid.shape[0]
    cap = state.capacity

    ls = jnp.broadcast_to(jnp.asarray(kernel.lengthscale, dtype),
                          (grid.shape[1],))
    zs = grid / ls
    xs = state.X / ls
    mask = (jnp.arange(cap) < state.count).astype(dtype)
    lm = state.Linv * mask[None, :]
    w_row = state.w[None, :]
    scal = jnp.stack([
        jnp.asarray(kernel.variance, dtype),
        jnp.asarray(kernel.variance, dtype),     # stationary kdiag
        jnp.asarray(beta, dtype),
        jnp.zeros((), dtype),
    ])[None, :]

    pad = (-n) % block
    if pad:
        zs = jnp.concatenate([zs, jnp.zeros((pad, zs.shape[1]), dtype)])
    out = _fused_intervals_impl(zs, xs, lm, w_row, scal,
                                kind="rbf" if isinstance(kernel, RBF)
                                else "matern32", block=block)
    if pad:
        out = out[:n]
    return out[:, 0], out[:, 1]
