"""Fully on-device safe-BO loops.

The reference's driver loop is inherently host-bound — evaluate the
real system, feed the observation back (examples/README.md:17-18). But
whenever the objective is computable on the accelerator (simulation,
surrogate benchmarking, self-play tuning, batch re-optimization), the
entire loop — fused SafeOpt iteration, observation, exact O(n^2) model
update — can run as ONE compiled program under ``lax.scan``: zero
host round trips between iterations. On a remote TPU that amortizes
the ~5 ms dispatch + pull latency across the whole run; on directly
attached hardware it removes the Python driver entirely.

New capability (no reference counterpart): the reference cannot
express this — every GPy refit is a host-side object mutation.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import with_matmul_precision
from ..gp.regression import gp_append
from .safe_opt_core import safeopt_step

__all__ = ["BOLoopResult", "run_safeopt_loop"]


class BOLoopResult(NamedTuple):
    """Trajectory of an on-device SafeOpt run."""

    states: Tuple                # final per-GP states (count grown)
    xs: jnp.ndarray              # (T, d) queried points
    ys: jnp.ndarray              # (T, G) observations fed to the GPs
    next_idx: jnp.ndarray        # (T,) chosen grid indices
    safe_counts: jnp.ndarray     # (T,) |S| per iteration
    has_safe: jnp.ndarray        # (T,) bool — all True on a healthy run


@partial(jax.jit, static_argnames=("objectives", "n_iter", "ucb",
                                   "use_lipschitz", "chunk", "use_pallas"))
@with_matmul_precision
def run_safeopt_loop(kernels, states, grid, fmin, beta, scaling, threshold,
                     key, *, objectives: Tuple[Callable, ...], n_iter: int,
                     lipschitz=None, noise_std=0.0, ucb: bool = False,
                     use_lipschitz: bool = False, chunk: int = 64,
                     use_pallas: bool = False) -> BOLoopResult:
    """Run ``n_iter`` complete SafeOpt iterations on device.

    Parameters
    ----------
    objectives : tuple of traceable callables, one per GP
        ``f_i(x (d,)) -> scalar`` — the simulated system. The first is
        the objective; the rest are the safety measurements.
    noise_std : float
        Gaussian observation noise added to every measurement.
    key : jax PRNG key
        Noise randomness.

    Every iteration performs the fused SafeOpt step (posterior +
    classification + expander search + selection), evaluates the
    objectives at the chosen grid point, and appends the observation to
    every GP via the exact bordered-Cholesky update. GP capacities must
    admit ``n_iter`` more points (grow the wrappers beforehand).

    Notes
    -----
    If the safe set empties mid-run (model misspecification), the loop
    cannot raise from inside the compiled program; iterations keep
    running on the degenerate argmax and ``has_safe`` records exactly
    where certification was lost — callers must check it.
    """
    num_gps = len(kernels)
    d = grid.shape[1]
    dtype = grid.dtype

    def body(carry, it_key):
        states = carry
        result = safeopt_step(kernels, states, grid, fmin, beta, scaling,
                              threshold, lipschitz, ucb=ucb,
                              use_lipschitz=use_lipschitz, chunk=chunk,
                              use_pallas=use_pallas)
        x = jnp.take(grid, result.next_idx, axis=0)          # (d,)
        noise = noise_std * jax.random.normal(it_key, (num_gps,),
                                              dtype=dtype)
        ys = jnp.stack([obj(x) for obj in objectives]) + noise
        states = tuple(
            gp_append(kern, st, x, ys[i])
            for i, (kern, st) in enumerate(zip(kernels, states)))
        out = (x, ys, result.next_idx, result.safe_count, result.has_safe)
        return states, out

    keys = jax.random.split(key, n_iter)
    states, (xs, ys, idxs, safe_counts, has_safe) = jax.lax.scan(
        body, tuple(states), keys)
    return BOLoopResult(states=states, xs=xs, ys=ys, next_idx=idxs,
                        safe_counts=safe_counts, has_safe=has_safe)
