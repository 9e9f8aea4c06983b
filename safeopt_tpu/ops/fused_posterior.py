"""Pallas TPU kernel: fused grid posterior + confidence intervals.

The XLA formulation of the grid posterior materializes two (capacity,
N) intermediates in HBM per GP — the cross-gram ``K(X, grid)`` and the
whitened solve ``V = Linv @ K`` — roughly ``2 * cap * N * 4`` bytes of
round-trip traffic per GP per iteration. This kernel streams the grid
once: each block computes its gram tile, the triangular-inverse
matmul, the mean / variance reductions and the beta-interval
arithmetic entirely in VMEM, writing only two interval rows.

Layout: everything is **features-first** so the large candidate-block
axis rides the 128 lanes — a (block, d) layout with d=2 would pad every
tile to 128 lanes and waste ~64x memory bandwidth on the grid reads
(f32 min tile is 8x128). Shapes inside the kernel:

    zt   (d,   B)  grid block, pre-scaled by the lengthscale
    xs   (cap, d)  pre-scaled training inputs
    kmat (cap, B) = kfun(|x|^2 + |z|^2 - 2 xs @ zt)     (MXU + VPU)
    V    (cap, B) = Lm @ kmat                            (MXU)
    mu   (1, B)   = w @ V
    out  (2, B)   = mu -+ beta * sqrt(kdiag - colsum(V^2))

``Lm = Linv * col_mask`` is pre-masked so padded factor rows vanish
without an in-kernel mask; inputs are pre-scaled so ARD costs nothing
per block. Supported for the stationary kernels (RBF, Matern-3/2,
Matern-5/2) and for product compositions of them — including the
reference's contextual kernels, ``RBF(active_dims=[0]) *
RBF(active_dims=[1])`` (context_example notebook; SURVEY.md section
2.9): each product part contributes its own lengthscale-scaled
squared-distance accumulation (a zero scale drops inactive dims), and
the part grams multiply in VMEM. Anything else falls back to the XLA
path automatically (``supports_kernel``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..gp.kernels import (Bias, Cosine, Exponential, Matern32,
                          Matern52, Product, RBF, Sum)

__all__ = ["fused_intervals", "supports_kernel"]

_STATIONARY = (RBF, Matern32, Matern52, Exponential, Cosine)


def _terms_of(kernel):
    """Expand a Sum/Product kernel tree into sum-of-products form.

    Returns a list of terms, each a list of leaf kernels whose grams
    multiply; term grams add. A single stationary kernel is one term
    with one leaf. Expansion is tiny for real kernel algebras (the
    reference's deepest composition is a two-part product).
    """
    if isinstance(kernel, Sum):
        return _terms_of(kernel.k1) + _terms_of(kernel.k2)
    if isinstance(kernel, Product):
        return [ta + tb
                for ta in _terms_of(kernel.k1)
                for tb in _terms_of(kernel.k2)]
    return [[kernel]]


def supports_kernel(kernel) -> bool:
    """True when the Pallas path can handle this kernel.

    Any Sum/Product algebra over stationary leaves (RBF, Matern-3/2,
    Matern-5/2, Exponential, Cosine) and Bias; ``active_dims`` are
    handled by zeroing the inactive entries of the per-leaf scale row.
    White is excluded (its gram is not a function of distance; the XLA
    path handles it exactly).
    """
    return all(isinstance(p, _STATIONARY + (Bias,))
               for term in _terms_of(kernel) for p in term)


_TRI_TILE = 128


def _dot3(a, b, acc):
    """3-pass bf16 emulation of an f32 matmul (``Precision.HIGH``
    semantics) for Mosaic, which lowers only DEFAULT/HIGHEST dots.

    Both operands split into exact bf16 hi/lo limbs (``hi = bf16(x)``,
    ``lo = x - hi`` — exactly representable residual); the three
    significant single-pass products accumulate in f32 on the MXU. The
    lo@lo term is below the f32 accumulation floor and is dropped,
    exactly like XLA's HIGH. Halves the MXU passes of the 6-pass
    HIGHEST whitened solve; decision error measured at ~1e-4 scaled
    through a kappa~1e6 factor (vs ~1e-2 for single-pass bf16, which
    is unsalvageable — see docs/design.md), small enough for the f64
    boundary certification band to absorb.
    """
    a_hi = a.astype(jnp.bfloat16).astype(acc)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(acc)
    b_lo = b - b_hi

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=acc)

    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _tri_matmul(lm, kmat, acc, three_pass: bool = False):
    """``lm @ kmat`` exploiting that ``lm`` is lower-triangular.

    For capacities >= 2 tiles the multiply is blocked and the
    strictly-upper tile products — identically zero — are skipped:
    at cap=512 that drops 6 of 16 (128,128)x(128,B) MXU passes, the
    dominant FLOPs of the hard-mode (many-observation) interval pass.
    Identical results to the single dot up to f32 summation order
    (each output tile is still accumulated left-to-right).

    ``three_pass`` runs every tile product at the emulated 3-pass
    precision (certified reduced-precision mode). The hi/lo bf16
    splits are hoisted OUT of the tile loops — one VPU pass over
    ``lm`` and ``kmat`` each, instead of per-tile-product casts that
    were measured to eat the entire MXU saving (docs/design.md).
    """
    cap = lm.shape[0]
    if three_pass:
        lm_hi = lm.astype(jnp.bfloat16).astype(acc)
        lm_lo = lm - lm_hi
        km_hi = kmat.astype(jnp.bfloat16).astype(acc)
        km_lo = kmat - km_hi

        def dotp(x, y):
            return jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=acc)

        def dot_rows(r0, r1, c0, c1):
            return (dotp(lm_hi[r0:r1, c0:c1], km_hi[c0:c1, :])
                    + dotp(lm_hi[r0:r1, c0:c1], km_lo[c0:c1, :])
                    + dotp(lm_lo[r0:r1, c0:c1], km_hi[c0:c1, :]))
    else:
        # Explicit HIGHEST: an ambient-precision dot here is a footgun
        # twice over — a caller invoking the fused ops outside
        # `with_matmul_precision` would silently get single-pass bf16
        # MXU passes (measured ~1e1 absolute interval error through an
        # |R|~1e3 factor), and an ambient 'high' crashes Mosaic
        # lowering of any precision-less dot outright.
        def dot_rows(r0, r1, c0, c1):
            return jax.lax.dot_general(
                lm[r0:r1, c0:c1], kmat[c0:c1, :],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=acc)

    if cap < 2 * _TRI_TILE or cap % _TRI_TILE:
        return dot_rows(0, cap, 0, cap)
    nt = cap // _TRI_TILE
    rows = []
    for i in range(nt):
        r0 = i * _TRI_TILE
        tile = None
        for j in range(i + 1):
            c0 = j * _TRI_TILE
            part = dot_rows(r0, r0 + _TRI_TILE, c0, c0 + _TRI_TILE)
            tile = part if tile is None else tile + part
        rows.append(tile)
    return jnp.concatenate(rows, axis=0)


def _kind_of(kernel) -> str:
    if isinstance(kernel, RBF):
        return "rbf"
    if isinstance(kernel, Matern52):
        return "matern52"
    if isinstance(kernel, Exponential):
        return "exponential"
    if isinstance(kernel, Cosine):
        return "cosine"
    if isinstance(kernel, Bias):
        return "bias"
    if isinstance(kernel, Matern32):
        return "matern32"
    # A kernel that passed supports_kernel gating but has no kind branch
    # would otherwise silently compute Matern-3/2 grams; fail loudly so
    # a gating/kind mismatch is caught at trace time.
    raise ValueError(
        f"no fused-kernel kind for {type(kernel).__name__}; add a branch "
        "here and in the Pallas kernels, or exclude it in supports_kernel")


def _part_plan(kernel, d: int, dtype):
    """Per-leaf scale rows + variances and the pre-scale decision.

    Returns ``(kinds, scales, pvars, prescale_ls, kdiag)`` where
    ``kinds`` is a static tuple of terms, each a tuple of leaf kind
    strings; the leaves of all terms are flattened in order into the
    (P, d) ``scales`` matrix and length-P ``pvars``. ``kdiag`` is the
    prior variance (sum over terms of the product of leaf variances).

    For a single full-dim stationary kernel the inputs are pre-scaled
    once by the lengthscale (``prescale_ls``) and the in-kernel scale
    row is exactly 1.0 — bit-identical to the historical single-kernel
    path. Compositions (and ``active_dims`` subsets) ship raw inputs
    with per-leaf scale rows: ``1/lengthscale`` on the leaf's active
    dims and 0 elsewhere, so inactive dims vanish from its distances.
    """
    terms = _terms_of(kernel)
    kinds = tuple(tuple(_kind_of(p) for p in term) for term in terms)
    leaves = [p for term in terms for p in term]
    pvars = jnp.stack([jnp.asarray(p.variance, dtype) for p in leaves])
    kdiag = sum(jnp.prod(jnp.stack(
        [jnp.asarray(p.variance, dtype) for p in term])) for term in terms)

    if (len(leaves) == 1 and not isinstance(leaves[0], Bias)
            and leaves[0].active_dims == tuple(range(d))):
        ls = jnp.broadcast_to(jnp.asarray(leaves[0].lengthscale, dtype),
                              (d,))
        return kinds, jnp.ones((1, d), dtype), pvars, ls, kdiag

    scales = jnp.zeros((len(leaves), d), dtype)
    for p, part in enumerate(leaves):
        if isinstance(part, Bias):
            continue  # constant: distances don't enter
        ls = jnp.broadcast_to(jnp.asarray(part.lengthscale, dtype),
                              (part.input_dim,))
        scales = scales.at[p, list(part.active_dims)].set(1.0 / ls)
    return kinds, scales, pvars, None, kdiag


def _part_gram(a, b_t, var_at, scale_at, kinds, acc,
               prescaled: bool = False):
    """Gram tile for a sum-of-products algebra of stationary kernels.

    ``var_at(p)`` / ``scale_at(p, k)`` read leaf p's variance and its
    per-dim inverse lengthscale (accessors so single-GP and batched
    multi-GP kernels share this body). ``a`` is (rows, d), ``b_t`` is
    (d, B) features-first; scaled squared
    distances accumulate by explicit per-dimension differences — for
    the small input dims of BO problems this is a handful of VPU
    passes, avoids the catastrophic-cancellation form
    |x|^2+|z|^2-2x.z (whose matmul rounding is amplified through the
    ill-conditioned factor), and skips the norm precomputations.
    Leaf grams multiply within a term; term grams add.

    ``prescaled`` (static) marks the single full-dim kernel case where
    the caller already divided inputs by the lengthscale: the per-dim
    scale multiply is skipped entirely — the grid-sized VPU work is
    identical to the pre-composition kernels (the multiply costs real
    time: ~1.5x on the 16-chunk expander-stress bench).
    """
    d = a.shape[1]
    out = None
    p = 0
    for term in kinds:
        kmat = None
        for kind in term:
            variance = var_at(p)
            if kind == "bias":
                kp = jnp.full((a.shape[0], b_t.shape[1]), 1.0, acc) * variance
                p += 1
            else:
                r2 = jnp.zeros((a.shape[0], b_t.shape[1]), acc)
                for k in range(d):
                    diff = a[:, k][:, None] - b_t[k, :][None, :]
                    if not prescaled:
                        diff = diff * scale_at(p, k)
                    r2 = r2 + diff * diff
                if kind == "rbf":
                    kp = variance * jnp.exp(-0.5 * r2)
                elif kind == "cosine":
                    kp = variance * jnp.cos(jnp.sqrt(r2 + 1e-36))
                elif kind == "exponential":
                    r = jnp.sqrt(r2 + 1e-36)
                    kp = variance * jnp.exp(-r)
                elif kind == "matern52":
                    r = jnp.sqrt(r2 + 1e-36)
                    s5r = jnp.sqrt(jnp.asarray(5.0, acc)) * r
                    kp = (variance * (1.0 + s5r + (5.0 / 3.0) * r2)
                          * jnp.exp(-s5r))
                else:  # matern32
                    r = jnp.sqrt(r2 + 1e-36)
                    s3r = jnp.sqrt(jnp.asarray(3.0, acc)) * r
                    kp = variance * (1.0 + s3r) * jnp.exp(-s3r)
                p += 1
            kmat = kp if kmat is None else kmat * kp
        out = kmat if out is None else out + kmat
    return out


def _interval_kernel(zt_ref, xs_ref, lm_ref, w_ref, scales_ref, pvar_ref,
                     scal_ref, out_ref, *,
                     kinds: Tuple[Tuple[str, ...], ...],
                     prescaled: bool, three_pass: bool = False):
    """One grid block: gram tile -> whitened solve -> intervals."""
    zt = zt_ref[:]                      # (d, B) grid block
    xs = xs_ref[:]                      # (cap, d) training inputs
    lm = lm_ref[:]                      # (cap, cap) masked Linv
    w = w_ref[:]                        # (1, cap) whitened targets
    acc = zt.dtype                      # f32 accum on TPU; f64 in x64 tests

    kdiag = scal_ref[0, 1]
    beta = scal_ref[0, 2]

    kmat = _part_gram(xs, zt, lambda p: pvar_ref[0, p],
                      lambda p, k: scales_ref[p, k], kinds, acc,
                      prescaled=prescaled)

    # V = Lm @ kmat : (cap, cap) x (cap, B), upper tiles skipped
    V = _tri_matmul(lm, kmat, acc, three_pass=three_pass)

    # mu as a VPU reduction: a (1, cap) x (cap, B) MXU dot pads the
    # single row to a full tile and costs ~1/4 of the V matmul at
    # 6-pass f32 (measured 3.2 ms/GP at cap=512); the broadcast-FMA
    # reduction rides the same path as the variance colsum instead.
    mu = jnp.sum(w[0][:, None] * V, axis=0)                # (B,)
    var = jnp.maximum(kdiag - jnp.sum(V * V, axis=0), 0.0)
    spread = beta * jnp.sqrt(var)
    out_ref[0, :] = mu - spread
    out_ref[1, :] = mu + spread


@functools.partial(jax.jit,
                   static_argnames=("kinds", "block", "prescaled",
                                    "three_pass"))
def _fused_intervals_impl(zt, xs, lm, w_row, scales, pvar, scal,
                          *, kinds: Tuple[Tuple[str, ...], ...],
                          block: int, prescaled: bool,
                          three_pass: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, n = zt.shape
    cap = xs.shape[0]
    P = scales.shape[0]
    grid = (n // block,)

    # Interpret mode keeps the kernel testable on the CPU mesh used by
    # the test suite; compiled Mosaic path on real TPUs.
    interpret = jax.default_backend() == "cpu"

    return pl.pallas_call(
        functools.partial(_interval_kernel, kinds=kinds,
                          prescaled=prescaled, three_pass=three_pass),
        out_shape=jax.ShapeDtypeStruct((2, n), zt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(zt, xs, lm, w_row, scales, pvar, scal)


def fused_vmem_ok(cap: int, num_gps: int, d: int) -> bool:
    """Conservative VMEM feasibility of the fused interval kernels.

    The whitened factors are resident for the whole pass
    (``num_gps * cap^2`` f32 — 8 MB at cap=1024 x 2 GPs) ON TOP of the
    per-block working set ``_pick_block`` budgets, and the 3-pass
    emulation roughly doubles the gram/solve tiles (hi/lo limbs).
    Round 5: cap=1024 x 2 GPs x 3-pass exceeded the 16 MB scoped VMEM
    by 8.8 MB at compile time on hardware. Oversized configurations
    route to the XLA interval path instead (correct, and the MXU still
    does the matmuls — only the manual fusion is lost).
    """
    factors = 4 * num_gps * cap * cap
    per_block = 2 * 4 * 512 * (2 * cap + 2 * num_gps + d + 16)
    return factors + per_block <= (12 << 20)


def _pick_block(cap: int, extra_rows: int = 0, budget_bytes: int = 6 << 20,
                cap_block: int = 4096) -> int:
    """Largest 512-multiple block whose VMEM working set fits.

    Working set per block column: ~(3*cap + extra) f32 values (gram
    tile, whitened solve, double-buffered input) — sized against a
    conservative slice of the 16 MB VMEM.
    """
    per_col = 4 * (3 * cap + extra_rows + 16)
    block = min(cap_block, max(512, (budget_bytes // per_col) // 512 * 512))
    return block


def fused_intervals(kernel, state, grid: jnp.ndarray, beta,
                    block: int = 0, three_pass: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(l, u) interval columns for one GP over the grid, fused.

    Pads the grid to a block multiple; callers slice the result. Raises
    for unsupported kernels — guard with ``supports_kernel``.
    """
    if not supports_kernel(kernel):
        raise TypeError(f"unsupported kernel for the fused path: {kernel!r}")

    dtype = grid.dtype
    n, d = grid.shape
    cap = state.capacity
    if not block:
        block = _pick_block(cap)

    kinds, scales, pvars, prescale_ls, kdiag = _part_plan(kernel, d, dtype)
    if prescale_ls is not None:
        zt = (grid / prescale_ls).T                 # (d, N) features-first
        xs = state.X / prescale_ls
    else:
        zt = grid.T
        xs = state.X
    mask = (jnp.arange(cap) < state.count).astype(dtype)
    lm = state.Linv * mask[None, :]
    w_row = state.w[None, :]
    # scal rows 0 and 3 are padding (the gram variance moved to pvar);
    # the kernel reads kdiag at [0,1] and beta at [0,2].
    zero = jnp.zeros((), dtype)
    scal = jnp.stack([
        zero,
        kdiag,
        jnp.asarray(beta, dtype),
        zero,
    ])[None, :]

    pad = (-n) % block
    if pad:
        zt = jnp.concatenate(
            [zt, jnp.zeros((zt.shape[0], pad), dtype)], axis=1)
    out = _fused_intervals_impl(zt, xs, lm, w_row, scales, pvars[None, :],
                                scal, kinds=kinds, block=block,
                                prescaled=prescale_ls is not None,
                                three_pass=three_pass)
    return out[0, :n], out[1, :n]


# ---------------------------------------------------------------------------
# multi-GP batched variant: one grid pass for all GPs
# ---------------------------------------------------------------------------

def _interval_kernel_multi(zt_ref, ils_ref, xs_ref, lm_ref, w_ref, scal_ref,
                           out_ref, *, kind: str, num_gps: int,
                           group_size: int = 1, three_pass: bool = False):
    """All GPs' interval rows from one pass over the grid block.

    Identical math to ``_interval_kernel`` unrolled over a leading GP
    axis; the raw grid block is scaled per GP in-kernel (inv
    lengthscales in ``ils``), so the grid is read from HBM once instead
    of once per GP.

    ``group_size > 1`` (small capacities): the whitened solves of
    ``group_size`` GPs run as ONE block-diagonal MXU dot. A cap=64
    contraction uses half the 128-deep systolic array, so two 64-cap
    GPs stacked into a (128, 128) x (128, B) dot finish in the wall
    time of one half-utilized per-GP dot. ``lm_ref`` then holds the
    per-group block-diagonal factors (ngroups, R, R), R = group_size *
    cap, and results are bit-identical: the off-diagonal zero blocks
    contribute exact ``+ 0.0`` terms to each f32 accumulation.
    """
    zt = zt_ref[:]                      # (d, B) raw grid block
    acc = zt.dtype
    d = zt.shape[0]

    def gram(g, xs):
        variance = scal_ref[g, 0]
        r2 = jnp.zeros((xs.shape[0], zt.shape[1]), acc)
        for k in range(d):
            diff = xs[:, k][:, None] - (zt[k, :] * ils_ref[g, k])[None, :]
            r2 = r2 + diff * diff

        if kind == "rbf":
            return variance * jnp.exp(-0.5 * r2)
        elif kind == "cosine":
            return variance * jnp.cos(jnp.sqrt(r2 + 1e-36))
        elif kind == "exponential":
            r = jnp.sqrt(r2 + 1e-36)
            return variance * jnp.exp(-r)
        elif kind == "matern52":
            r = jnp.sqrt(r2 + 1e-36)
            s5r = jnp.sqrt(jnp.asarray(5.0, acc)) * r
            return (variance * (1.0 + s5r + (5.0 / 3.0) * r2)
                    * jnp.exp(-s5r))
        else:
            r = jnp.sqrt(r2 + 1e-36)
            s3r = jnp.sqrt(jnp.asarray(3.0, acc)) * r
            return variance * (1.0 + s3r) * jnp.exp(-s3r)

    def emit(g, V):
        kdiag = scal_ref[g, 1]
        beta = scal_ref[g, 2]
        # VPU mu reduction — see _interval_kernel
        mu = jnp.sum(w_ref[g][:, None] * V, axis=0)
        var = jnp.maximum(kdiag - jnp.sum(V * V, axis=0), 0.0)
        spread = beta * jnp.sqrt(var)
        out_ref[g, 0, :] = mu - spread
        out_ref[g, 1, :] = mu + spread

    if group_size == 1:
        for g in range(num_gps):
            V = _tri_matmul(lm_ref[g], gram(g, xs_ref[g]), acc,
                            three_pass=three_pass)
            emit(g, V)
        return

    cap = xs_ref.shape[1]
    for t in range(-(-num_gps // group_size)):
        members = range(t * group_size, (t + 1) * group_size)
        # A partial last group pads with zero gram blocks (matching the
        # zero factor blocks built host-side) — exact and still one dot.
        kstack = jnp.concatenate(
            [gram(g, xs_ref[g]) if g < num_gps
             else jnp.zeros((cap, zt.shape[1]), acc)
             for g in members], axis=0)                      # (R, B)
        Vstack = _tri_matmul(lm_ref[t], kstack, acc,
                             three_pass=three_pass)
        for j, g in enumerate(members):
            if g < num_gps:
                emit(g, Vstack[j * cap:(j + 1) * cap])


@functools.partial(jax.jit, static_argnames=("kind", "block", "num_gps",
                                             "group_size", "three_pass"))
def _fused_intervals_multi_impl(zt, ils, xs, lm, w, scal, *, kind: str,
                                block: int, num_gps: int,
                                group_size: int = 1,
                                three_pass: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, n = zt.shape
    cap = xs.shape[1]
    grid = (n // block,)
    interpret = jax.default_backend() == "cpu"

    # lm is (num_gps, cap, cap) per-GP factors when group_size == 1,
    # else (ngroups, R, R) block-diagonal group factors.
    nfac, R = lm.shape[0], lm.shape[1]

    return pl.pallas_call(
        functools.partial(_interval_kernel_multi, kind=kind,
                          num_gps=num_gps, group_size=group_size,
                          three_pass=three_pass),
        out_shape=jax.ShapeDtypeStruct((num_gps, 2, n), zt.dtype),
        grid=grid,
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
        out_specs=pl.BlockSpec((num_gps, 2, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(zt, ils, xs, lm, w, scal)


def supports_batched(kernels, states, d=None) -> bool:
    """One fused call for all GPs: same kernel family and capacity.

    The batched kernels are specialized to plain stationary kernels
    reading EVERY grid column (pass the grid width ``d``: a kernel
    whose ``input_dim`` is smaller would silently accumulate distances
    over columns it does not own in the batched gram); products
    (contexts) and active_dims subsets run one fused pass per GP
    instead.
    """
    if len(kernels) < 2:
        return False
    if not all(isinstance(k, _STATIONARY)
               and k.active_dims == tuple(range(k.input_dim))
               for k in kernels):
        return False
    if d is not None and any(k.input_dim != d for k in kernels):
        return False
    if len({type(k) for k in kernels}) != 1:
        return False
    if len({s.capacity for s in states}) != 1:
        return False
    if not fused_vmem_ok(states[0].capacity, len(kernels),
                         kernels[0].input_dim):
        return False
    return len({k.input_dim for k in kernels}) == 1


def fused_intervals_batched(kernels, states, grid: jnp.ndarray, beta,
                            block: int = 0, three_pass: bool = False):
    """Per-GP (l, u) interval rows, one grid pass for every GP."""
    dtype = grid.dtype
    n, d = grid.shape
    cap = states[0].capacity
    num_gps = len(kernels)
    if not block:
        block = _pick_block(cap, extra_rows=cap * (num_gps - 1))

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
            jnp.asarray(beta, dtype),
            jnp.zeros((), dtype)]))

    zt = grid.T
    pad = (-n) % block
    if pad:
        zt = jnp.concatenate([zt, jnp.zeros((d, pad), dtype)], axis=1)

    # Small capacities under-fill the 128-deep MXU contraction: stack
    # group_size = 128 // cap GPs' whitened solves into one
    # block-diagonal dot per group (see _interval_kernel_multi).
    group_size = 1
    if cap < 128:
        group_size = max(1, min(num_gps, 128 // cap))
    if group_size > 1:
        # A non-dividing num_gps pads the last group's factor (and, in
        # the kernel, its gram rows) with zeros — exact, and two padded
        # 128-deep dots still beat three half-filled 64-deep ones.
        R = group_size * cap
        groups = []
        for t in range(-(-num_gps // group_size)):
            blk = jnp.zeros((R, R), dtype)
            for j in range(group_size):
                g = t * group_size + j
                if g < num_gps:
                    blk = blk.at[j * cap:(j + 1) * cap,
                                 j * cap:(j + 1) * cap].set(lm_rows[g])
            groups.append(blk)
        lm_in = jnp.stack(groups)
    else:
        lm_in = jnp.stack(lm_rows)

    out = _fused_intervals_multi_impl(
        zt, jnp.stack(ils_rows), jnp.stack(xs_rows), lm_in,
        jnp.stack(w_rows), jnp.stack(scal_rows),
        kind=_kind_of(kernels[0]), block=block, num_gps=num_gps,
        group_size=group_size, three_pass=three_pass)
    return [(out[g, 0, :n], out[g, 1, :n]) for g in range(num_gps)]
