"""Contextual safe optimization (port of the reference context_example
notebook): kernel = RBF(parameter) x RBF(context) via active_dims, one
context column, context switched 0 -> 0.1 mid-run."""

import os
import sys

# allow running straight from a repo checkout: python examples/<name>.py
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse

import jax
import numpy as np

from safeopt_tpu import (SafeOpt, linearly_spaced_combinations,
                         sample_gp_function)
from safeopt_tpu.gp import GPRegression, RBF


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=10,
                        help="iterations per context")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    noise_var = 0.05 ** 2
    # Joint bounds: parameter dim then context dim.
    bounds = [(-5.0, 5.0), (-1.0, 1.0)]
    kernel = (RBF(1, variance=2.0, lengthscale=1.0, active_dims=[0]) *
              RBF(1, variance=1.0, lengthscale=1.0, active_dims=[1],
                  name="context"))

    key = jax.random.key(args.seed)
    x0 = np.array([[0.0, 0.0]])
    while True:
        key, sub = jax.random.split(key)
        fun = sample_gp_function(kernel, bounds, noise_var, 50, key=sub)
        if float(fun(x0, noise=False)[0, 0]) > 0.5:
            break

    gp = GPRegression(x0, np.asarray(fun(x0)), kernel, noise_var=noise_var)

    parameter_set = linearly_spaced_combinations([bounds[0]], 1000)
    opt = SafeOpt(gp, parameter_set, fmin=[0.0], num_contexts=1,
                  threshold=0.1)

    for context in (0.0, 0.1):
        print(f"\n--- context = {context} ---")
        for i in range(args.iters):
            x_next = opt.optimize(context=np.array([context]))
            joint = np.concatenate([np.atleast_1d(x_next), [context]])
            y = np.asarray(fun(joint[None, :]))
            opt.add_new_data_point(x_next, y, context=np.array([context]))
            print(f"iter {i:3d}  x={np.asarray(x_next).ravel()}  "
                  f"y={float(y[0, 0]):+.4f}")

        best = opt.get_maximum(context=np.array([context]))
        if best is not None:
            print(f"best at context {context}: x={best[0]}  "
                  f"lower-bound={best[1]:.4f}")


if __name__ == "__main__":
    main()
