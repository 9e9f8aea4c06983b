"""Fully on-device safe-BO campaigns (new capability, no reference
counterpart — the reference's loop is inherently host-bound,
examples/README.md:17-18).

When the objective is computable on the accelerator (simulation,
surrogate benchmarking), the entire campaign — fused iteration,
observation, exact O(n^2) model update — runs as ONE compiled program
under ``lax.scan``: zero host round trips between iterations.

Usage: python examples/example_on_device_loop.py [--iters 10]
"""

import argparse
import sys

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from safeopt_tpu import linearly_spaced_combinations
    from safeopt_tpu.algorithms.runner import (run_safeopt_loop,
                                               run_swarmopt_loop)
    from safeopt_tpu.algorithms.swarm_opt_fused import SwarmIterState
    from safeopt_tpu.gp import GPRegression, RBF

    dtype_probe = GPRegression(np.zeros((1, 2)), np.zeros((1, 1)),
                               RBF(2), noise_var=1.0)
    dtype = dtype_probe.state.X.dtype

    # device-computable objective + safety measurement
    def f(x):
        return 2.0 * jnp.exp(-0.5 * jnp.sum(x * x))

    def g(x):
        return 1.0 - 0.1 * jnp.sum(x * x)

    # ---- SafeOpt campaign over a 200x200 grid --------------------------
    grid = linearly_spaced_combinations([(-3.0, 3.0), (-3.0, 3.0)], 200)
    x0 = np.zeros((1, 2))
    gp_f = GPRegression(x0, np.array([[2.0]]), RBF(2, variance=2.0),
                        noise_var=1e-4, capacity=64)
    gp_g = GPRegression(x0, np.array([[1.0]]),
                        RBF(2, variance=1.0, lengthscale=1.5),
                        noise_var=1e-4, capacity=64)

    res = run_safeopt_loop(
        (gp_f.kern, gp_g.kern), (gp_f.state, gp_g.state),
        jnp.asarray(grid, dtype), jnp.asarray([0.2, 0.5], dtype),
        jnp.asarray(2.0, dtype), jnp.asarray([np.sqrt(2.0), 1.0], dtype),
        jnp.asarray([0.0, 0.0], dtype), jax.random.key(0),
        objectives=(f, g), n_iter=args.iters, noise_std=0.01)
    assert bool(np.asarray(res.has_safe).all()), "lost certification"
    ys = np.asarray(res.ys)
    print(f"SafeOpt on-device campaign: {args.iters} iterations, "
          f"best y = {ys[:, 0].max():.4f}, "
          f"final |S| = {int(np.asarray(res.safe_counts)[-1])}")

    # ---- SafeOptSwarm campaign in the continuous domain ----------------
    d = 2
    cap = 256
    S_buf = np.zeros((cap, d))
    iter_state = SwarmIterState(S=jnp.asarray(S_buf, dtype),
                                count=jnp.asarray(1, jnp.int32),
                                greedy=jnp.asarray(np.zeros(d), dtype))
    res2 = run_swarmopt_loop(
        (gp_f.kern,), (gp_f.state,), iter_state, jax.random.key(1),
        jnp.asarray([0.3, 0.3], dtype),
        jnp.asarray([[-3.0, 3.0]] * d, dtype),
        jnp.asarray([0.0], dtype), jnp.asarray([np.sqrt(2.0)], dtype),
        jnp.asarray([0.0], dtype), np.full(args.iters, 2.0),
        np.zeros(d), -np.inf, objectives=(f,), n_iter=args.iters,
        swarm_size=12, max_iters=30, noise_std=0.01)
    assert (np.asarray(res2.num_safe_min) > 0).all(), "lost certification"
    ys2 = np.asarray(res2.ys)
    print(f"SafeOptSwarm on-device campaign: {args.iters} iterations, "
          f"best y = {ys2[:, 0].max():.4f}, "
          f"final |S| = {int(np.asarray(res2.safe_counts)[-1])}")

    print("best:", np.asarray(res.xs)[int(np.argmax(ys[:, 0]))],
          f"value={ys[:, 0].max():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
