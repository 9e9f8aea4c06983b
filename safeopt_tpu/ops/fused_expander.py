"""Pallas TPU kernel: fused expander predicate for a candidate chunk.

The expander test conditions constraint GP i on a virtual observation
``(x_cand, u_i)`` and asks whether any currently-unsafe grid point's
lower bound rises above ``fmin_i`` (reference gp_opt.py:577-606; the
rank-1 form is derived in algorithms/safe_opt_core.py). Per candidate
chunk the XLA path materializes two (C, N) and one (cap, N) HBM
intermediates; this kernel streams the grid once per chunk and reduces
in VMEM:

    per grid block zt (d, B):
        kmat  (cap, B) = kfun(xs, zt)            gram tile
        cross (C, B)   = M2 @ kmat               (M2 = Cm^T Lm, C x cap)
        E     (C, B)   = (kc(Xc, zt) - cross) / dd
        l2    (C, B)   = mu + E*gain - beta*sqrt(max(var - E^2, 0))
        acc   (C,)    |= any_B(unsafe & (l2 >= fmin))

    The grid posterior (mu, sigma) rows come in from the interval pass
    (two (1, B) blocks) instead of being recomputed — that removes the
    (cap, cap) x (cap, B) whitened-solve matmul, the dominant FLOPs at
    large capacity under full-f32 precision.

Output is the (C,) boolean predicate, OR-accumulated across grid
blocks (sequential grid on TPU guarantees accumulation order). The
candidate-side quantities (M2, dd, gain, kc-scaled candidates) are
tiny and precomputed by XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_posterior import (_kind_of, _part_gram, _part_plan,
                              supports_kernel)

__all__ = ["fused_expander_predicate"]


def _expander_kernel(zt_ref, unsafe_ref, mu_ref, sigma_ref, xs_ref,
                     xc_ref, m2_ref, cvec_ref, scales_ref, pvar_ref,
                     scal_ref, out_ref, *,
                     kinds: Tuple[Tuple[str, ...], ...], prescaled: bool):
    zt = zt_ref[:]                       # (d, B)
    xs = xs_ref[:]                       # (cap, d)
    xc = xc_ref[:]                       # (C, d) candidates
    m2 = m2_ref[:]                       # (C, cap) = Cm^T Lm
    cvec = cvec_ref[:]                   # (3, C) rows: inv_dd, gain, valid
    unsafe = unsafe_ref[:]               # (1, B) 0/1 mask
    mu = mu_ref[:]                       # (1, B) grid posterior mean
    sigma = sigma_ref[:]                 # (1, B) grid posterior std
    acc = zt.dtype

    beta = scal_ref[0, 2]
    fmin_i = scal_ref[0, 3]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, :] = jnp.zeros_like(out_ref[0, :])

    # A block with no unsafe points cannot contribute: ``hit`` is
    # identically false there, so the gram / cross-dot / interval
    # arithmetic — the entire per-block cost — is skipped. On a
    # converged run (few or clustered unsafe points) most blocks skip;
    # results are exactly identical either way.
    @pl.when(jnp.any(unsafe > 0.5))
    def _():
        # gram tiles by explicit per-dimension differences, product
        # parts multiplied in VMEM (see fused_posterior._part_gram)
        kmat = _part_gram(xs, zt, lambda p: pvar_ref[0, p],
                          lambda p, k: scales_ref[p, k], kinds, acc,
                          prescaled=prescaled)                   # (cap, B)
        var = sigma * sigma
        kc = _part_gram(xc, zt, lambda p: pvar_ref[0, p],
                        lambda p, k: scales_ref[p, k], kinds, acc,
                        prescaled=prescaled)                     # (C, B)
        # Explicit HIGHEST — see fused_posterior._tri_matmul:
        # precision-less dots inherit the ambient setting (bf16 garbage
        # on a bare call, Mosaic lowering crash under ambient 'high').
        cross = jax.lax.dot_general(m2, kmat, (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=acc)
        inv_dd = cvec[0, :][:, None]                       # (C, 1)
        gain = cvec[1, :][:, None]
        valid = cvec[2, :][:, None]

        E = (kc - cross) * inv_dd                          # (C, B)
        var2 = jnp.maximum(var - E * E, 0.0)
        l2 = mu + E * gain - beta * jnp.sqrt(var2)

        hit = (unsafe > 0.5) & (l2 >= fmin_i) & (valid > 0.5)  # (C, B)
        # f32 0/1 accumulator (bool VMEM tiles are fragile across
        # Mosaic versions); caller thresholds at 0.5.
        partial = jnp.any(hit, axis=1).astype(acc)         # (C,)
        out_ref[0, :] = jnp.maximum(out_ref[0, :], partial)


@functools.partial(jax.jit,
                   static_argnames=("kinds", "block", "prescaled"))
def _fused_expander_impl(zt, unsafe_row, mu_row, sigma_row, xs, xc, m2,
                         cvec, scales, pvar, scal,
                         *, kinds: Tuple[Tuple[str, ...], ...],
                         block: int, prescaled: bool):
    from jax.experimental.pallas import tpu as pltpu

    d, n = zt.shape
    cap = xs.shape[0]
    C = xc.shape[0]
    P = scales.shape[0]
    grid = (n // block,)
    interpret = jax.default_backend() == "cpu"

    out = pl.pallas_call(
        functools.partial(_expander_kernel, kinds=kinds,
                          prescaled=prescaled),
        out_shape=jax.ShapeDtypeStruct((1, C), zt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(zt, unsafe_row, mu_row, sigma_row, xs, xc, m2, cvec, scales, pvar,
      scal)
    return out[0] > 0.5


def fused_expander_predicate(kernel, state, grid, unsafe, mu, sigma, Xc,
                             uc, valid, beta, fmin_i, block: int = 0):
    """(C,) expander predicate for constraint GP ``kernel``/``state``.

    Computes the candidate-side rank-1 quantities with XLA (tiny) and
    streams the grid through the Pallas kernel. ``Xc`` are candidate
    rows (C, d), ``uc`` their upper bounds for this GP; ``mu``/``sigma``
    are this GP's grid posterior rows from the interval pass.
    """
    if not supports_kernel(kernel):
        raise TypeError(f"unsupported kernel: {kernel!r}")
    dtype = grid.dtype
    cap = state.capacity
    if not block:
        from .fused_posterior import _pick_block
        block = _pick_block(cap, extra_rows=6 * Xc.shape[0])

    kinds, scales, pvars, prescale_ls, _kdiag = _part_plan(
        kernel, grid.shape[1], dtype)
    mask = (jnp.arange(cap) < state.count).astype(dtype)
    lm = state.Linv * mask[None, :]

    # candidate-side rank-1 terms (all O(C * cap^2)); pin the decision
    # precision so a bare call outside `with_matmul_precision` cannot
    # silently run these at single-pass bf16
    from .. import config
    with jax.default_matmul_precision(config.MATMUL_PRECISION):
        kmat_c = kernel.K(state.X, Xc) * mask[:, None]   # (cap, C)
        Cm = state.Linv @ kmat_c                         # (cap, C)
        dd2 = (kernel.Kdiag(Xc) + state.noise_var
               - jnp.sum(Cm * Cm, axis=0))
        dd = jnp.sqrt(jnp.maximum(dd2, 1e-30))
        gain = (uc - Cm.T @ state.w) / dd
        M2 = Cm.T @ lm                                    # (C, cap)

    cvec = jnp.stack([1.0 / dd, gain,
                      valid.astype(dtype)], axis=0)       # (3, C)
    # scal rows 0-1 are padding (the gram variance moved to pvar);
    # only beta and fmin are read by the kernel.
    zero = jnp.zeros((), dtype)
    scal = jnp.stack([
        zero,
        zero,
        jnp.asarray(beta, dtype),
        jnp.asarray(fmin_i, dtype),
    ])[None, :]

    n = grid.shape[0]
    if prescale_ls is not None:
        zt = (grid / prescale_ls).T
        xs = state.X / prescale_ls
        xc = Xc / prescale_ls
    else:
        zt = grid.T
        xs = state.X
        xc = Xc
    unsafe_row = unsafe.astype(dtype)[None, :]
    mu_row = mu[None, :]
    sigma_row = sigma[None, :]

    pad = (-n) % block
    if pad:
        zpad = jnp.zeros((1, pad), dtype)
        zt = jnp.concatenate([zt, jnp.zeros((zt.shape[0], pad), dtype)],
                             axis=1)
        unsafe_row = jnp.concatenate([unsafe_row, zpad], axis=1)
        mu_row = jnp.concatenate([mu_row, zpad], axis=1)
        sigma_row = jnp.concatenate([sigma_row, zpad], axis=1)

    return _fused_expander_impl(zt, unsafe_row, mu_row, sigma_row, xs,
                                xc, M2, cvec, scales, pvars[None, :],
                                scal, kinds=kinds, block=block,
                                prescaled=prescale_ls is not None)


# ---------------------------------------------------------------------------
# multi-GP batched variant: one grid pass per candidate chunk
# ---------------------------------------------------------------------------

def _expander_kernel_multi(zt_ref, unsafe_ref, mu_ref, sigma_ref, ils_ref,
                           xs_ref, xc_ref, m2_ref, cvec_ref, scal_ref,
                           out_ref, *, kind: str, num_gps: int,
                           group_size: int = 1):
    """(G, C) expander predicates from one pass over the grid block.

    ``group_size > 1`` (small capacities): the per-GP ``cross`` dots
    run as ONE block-diagonal MXU dot per group — ``m2_ref`` holds
    (ngroups, gsz*C, gsz*cap) block-diagonal candidate projections and
    the member grams concatenate on the contraction axis, filling the
    128-deep systolic array (see fused_posterior's stacked solve;
    bit-identical, the zero blocks add exact +0.0 terms).
    """
    zt = zt_ref[:]                       # (d, B) raw grid block
    unsafe = unsafe_ref[:]               # (1, B)
    acc = zt.dtype
    d = zt.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref[:])

    def gram(g, a):
        variance = scal_ref[g, 0]
        r2 = jnp.zeros((a.shape[0], zt.shape[1]), acc)
        for k in range(d):
            zk = zt[k, :] * ils_ref[g, k]
            diff = a[:, k][:, None] - zk[None, :]
            r2 = r2 + diff * diff
        if kind == "rbf":
            return variance * jnp.exp(-0.5 * r2)
        r = jnp.sqrt(r2 + 1e-36)
        if kind == "cosine":
            return variance * jnp.cos(r)
        if kind == "exponential":
            return variance * jnp.exp(-r)
        if kind == "matern52":
            s5r = jnp.sqrt(jnp.asarray(5.0, acc)) * r
            return (variance * (1.0 + s5r + (5.0 / 3.0) * r2)
                    * jnp.exp(-s5r))
        s3r = jnp.sqrt(jnp.asarray(3.0, acc)) * r
        return variance * (1.0 + s3r) * jnp.exp(-s3r)

    def emit(g, cross):
        beta = scal_ref[g, 2]
        fmin_i = scal_ref[g, 3]
        mu = mu_ref[g][None, :]          # (1, B)
        sigma = sigma_ref[g][None, :]
        cvec = cvec_ref[g]               # (3, C)
        kc = gram(g, xc_ref[g])                          # (C, B)
        inv_dd = cvec[0, :][:, None]
        gain = cvec[1, :][:, None]
        valid = cvec[2, :][:, None]

        E = (kc - cross) * inv_dd
        var2 = jnp.maximum(sigma * sigma - E * E, 0.0)
        l2 = mu + E * gain - beta * jnp.sqrt(var2)
        hit = (unsafe > 0.5) & (l2 >= fmin_i) & (valid > 0.5)
        partial = jnp.any(hit, axis=1).astype(acc)       # (C,)
        out_ref[g, :] = jnp.maximum(out_ref[g, :], partial)

    # Skip the whole block when it holds no unsafe points — ``hit`` is
    # identically false there (see _expander_kernel); exact either way.
    @pl.when(jnp.any(unsafe > 0.5))
    def _():
        if group_size == 1:
            for g in range(num_gps):
                kmat = gram(g, xs_ref[g])                # (cap, B)
                cross = jax.lax.dot_general(
                    m2_ref[g], kmat, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=acc)
                emit(g, cross)
            return

        C = xc_ref.shape[1]
        cap = xs_ref.shape[1]
        for t in range(-(-num_gps // group_size)):
            members = range(t * group_size, (t + 1) * group_size)
            # A partial last group pads with zero gram blocks (matching
            # the zero projection blocks built host-side) — exact, one
            # dot.
            kstack = jnp.concatenate(
                [gram(g, xs_ref[g]) if g < num_gps
                 else jnp.zeros((cap, zt.shape[1]), acc)
                 for g in members], axis=0)
            cross_stack = jax.lax.dot_general(
                m2_ref[t], kstack, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=acc)              # (gsz*C, B)
            for j, g in enumerate(members):
                if g < num_gps:
                    emit(g, cross_stack[j * C:(j + 1) * C])


@functools.partial(jax.jit, static_argnames=("kind", "block", "num_gps",
                                             "group_size"))
def _fused_expander_multi_impl(zt, unsafe_row, mu_rows, sigma_rows, ils,
                               xs, xc, m2, cvec, scal, *, kind: str,
                               block: int, num_gps: int,
                               group_size: int = 1):
    from jax.experimental.pallas import tpu as pltpu

    d, n = zt.shape
    cap = xs.shape[1]
    C = xc.shape[1]
    grid = (n // block,)
    interpret = jax.default_backend() == "cpu"

    # m2 is (num_gps, C, cap) when group_size == 1, else block-diagonal
    # group projections (ngroups, gsz*C, gsz*cap).
    m2_shape = tuple(m2.shape)

    out = pl.pallas_call(
        functools.partial(_expander_kernel_multi, kind=kind,
                          num_gps=num_gps, group_size=group_size),
        out_shape=jax.ShapeDtypeStruct((num_gps, C), zt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_gps, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_gps, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_gps, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_gps, cap, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_gps, C, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(m2_shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_gps, 3, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_gps, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((num_gps, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(zt, unsafe_row, mu_rows, sigma_rows, ils, xs, xc, m2, cvec, scal)
    return out > 0.5


def fused_expander_predicate_batched(kernels, states, grid, unsafe, mus,
                                     sigmas, Xc, ucs, valid, beta, fmin,
                                     block: int = 0):
    """(G, C) expander predicates, one grid pass per chunk for all GPs.

    ``ucs`` is (G, C): per-GP upper bounds of the candidates; ``mus`` /
    ``sigmas`` are the per-GP grid posterior rows from the interval
    pass. A GP with ``fmin_i = -inf`` still gets a row (the caller
    masks it out) — its predicate is computed against ``-inf`` and is
    trivially True wherever any unsafe point exists.
    """
    dtype = grid.dtype
    n, d = grid.shape
    cap = states[0].capacity
    num_gps = len(kernels)
    C = Xc.shape[0]
    if not block:
        from .fused_posterior import _pick_block
        block = _pick_block(cap, extra_rows=(cap + 6 * C) * (num_gps - 1)
                            + 6 * C)

    ils_r, xs_r, xc_r, m2_r, cvec_r, scal_r, mu_r, sg_r = \
        [], [], [], [], [], [], [], []
    from .. import config
    for g, (kern, st) in enumerate(zip(kernels, states)):
        ls = jnp.broadcast_to(jnp.asarray(kern.lengthscale, dtype), (d,))
        mask = (jnp.arange(cap) < st.count).astype(dtype)
        lm = st.Linv * mask[None, :]

        # pinned decision precision — see fused_expander_predicate
        with jax.default_matmul_precision(config.MATMUL_PRECISION):
            kmat_c = kern.K(st.X, Xc) * mask[:, None]
            Cm = st.Linv @ kmat_c
            dd2 = (kern.Kdiag(Xc) + st.noise_var
                   - jnp.sum(Cm * Cm, axis=0))
            dd = jnp.sqrt(jnp.maximum(dd2, 1e-30))
            gain = (ucs[g] - Cm.T @ st.w) / dd
            m2 = Cm.T @ lm

        ils_r.append(1.0 / ls)
        xs_r.append(st.X / ls)
        xc_r.append(Xc / ls)
        m2_r.append(m2)
        cvec_r.append(jnp.stack([1.0 / dd, gain, valid.astype(dtype)]))
        scal_r.append(jnp.stack([
            jnp.asarray(kern.variance, dtype),
            jnp.asarray(kern.variance, dtype),
            jnp.asarray(beta, dtype),
            jnp.asarray(fmin[g], dtype)]))
        mu_r.append(mus[g])
        sg_r.append(sigmas[g])

    zt = grid.T
    unsafe_row = unsafe.astype(dtype)[None, :]
    mu_rows = jnp.stack(mu_r)
    sigma_rows = jnp.stack(sg_r)
    pad = (-n) % block
    if pad:
        zp = jnp.zeros((1, pad), dtype)
        zt = jnp.concatenate([zt, jnp.zeros((d, pad), dtype)], axis=1)
        unsafe_row = jnp.concatenate([unsafe_row, zp], axis=1)
        gp_pad = jnp.zeros((num_gps, pad), dtype)
        mu_rows = jnp.concatenate([mu_rows, gp_pad], axis=1)
        sigma_rows = jnp.concatenate([sigma_rows, gp_pad], axis=1)

    # Small capacities: stack group_size GPs' cross dots into one
    # block-diagonal dot (see _expander_kernel_multi).
    # Grouping helps the expander dot only while the grouped OUTPUT
    # rows (group_size * C) still fit one MXU row tile: at C=32 the
    # per-GP dot under-fills both axes and stacking is a measured win,
    # but at C=256 the output rows already fill the MXU and the
    # block-diagonal zeros are pure extra passes + VMEM pressure — a
    # measured 2x slowdown on the chunk-256 expander-stress config.
    group_size = 1
    if cap < 128:
        group_size = max(1, min(num_gps, 128 // cap, 128 // C))
    if group_size > 1:
        # Non-dividing num_gps: zero-pad the last group (see the
        # fused_posterior wrapper) — exact, still fewer dots.
        groups = []
        for t in range(-(-num_gps // group_size)):
            blk = jnp.zeros((group_size * C, group_size * cap), dtype)
            for j in range(group_size):
                g = t * group_size + j
                if g < num_gps:
                    blk = blk.at[j * C:(j + 1) * C,
                                 j * cap:(j + 1) * cap].set(m2_r[g])
            groups.append(blk)
        m2_in = jnp.stack(groups)
    else:
        m2_in = jnp.stack(m2_r)

    kind = _kind_of(kernels[0])
    return _fused_expander_multi_impl(
        zt, unsafe_row, mu_rows, sigma_rows, jnp.stack(ils_r),
        jnp.stack(xs_r), jnp.stack(xc_r), m2_in,
        jnp.stack(cvec_r), jnp.stack(scal_r), kind=kind, block=block,
        num_gps=num_gps, group_size=group_size)
