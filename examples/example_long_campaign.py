"""Long production campaign: sparse model, mid-run resume, hyperopt.

Demonstrates the round-3 production path end to end (all new
capability — the reference has neither sparse inference, persistence,
nor hyperparameter fitting):

1. A DTC sparse GP bounds per-iteration cost by m inducing points; its
   model update is an O(m^2) incremental rank-1 information update, so
   appending observation #2,000 costs the same as #10.
2. The campaign checkpoints its DEVICE loop state mid-run
   (checkpoint.save_state) and resumes bit-identically via the
   runners' explicit per-iteration key stream (it_keys).
3. Hyperparameters are refit from accumulated data with multi-start
   marginal-likelihood optimization (vmapped restarts).

Usage: python examples/example_long_campaign.py [--n-pre 400]
       [--iters 24] [--inducing 32]
"""

import argparse
import os
import tempfile

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-pre", type=int, default=400,
                        help="pre-existing observations (the 'long' part)")
    parser.add_argument("--iters", type=int, default=24)
    parser.add_argument("--inducing", type=int, default=32)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from safeopt_tpu import SafeOpt, linearly_spaced_combinations
    from safeopt_tpu.gp import GPRegression, RBF
    from safeopt_tpu.gp.sparse import SparseGPRegression
    from safeopt_tpu.utils.checkpoint import load_state, save_state

    rng = np.random.default_rng(0)

    def f_true(x):
        x = np.atleast_2d(x)
        return 2.0 * np.exp(-0.5 * np.sum(x * x, axis=1))

    # ---- a long history of safe operating points -----------------------
    X_pre = rng.uniform(-0.8, 0.8, size=(args.n_pre, 2))
    Y_pre = (f_true(X_pre) + 0.02 * rng.normal(size=args.n_pre))[:, None]

    # Inducing points must COVER the search domain, not just the data
    # hull: a DTC posterior cannot reduce variance where k(Z, x) ~ 0,
    # so data-hull-only inducing points freeze exploration outside it.
    side = max(2, int(np.sqrt(args.inducing)))
    Z = np.asarray(linearly_spaced_combinations(
        [(-2.5, 2.5), (-2.5, 2.5)], side))
    sparse = SparseGPRegression(X_pre, Y_pre,
                                RBF(2, variance=1.0, lengthscale=0.5),
                                noise_var=0.02 ** 2, inducing=Z)

    # ---- refit hyperparameters from the accumulated data ---------------
    lml = sparse.optimize_hyperparameters(steps=150, restarts=3)
    print(f"hyperopt: DTC LML {lml:.1f}, "
          f"lengthscale {float(np.asarray(sparse.kern.lengthscale)):.3f}, "
          f"noise {sparse.noise_var:.5f}")

    # ---- host-driven SafeOpt on the sparse model ------------------------
    # exact_boundaries works for sparse models too (round 3c): the
    # near-threshold safe bits are decided by the host-f64 DTC oracle
    # (sparse.predict_f64), so the float32 device pseudo-factor's
    # conditioning noise never flips a knife-edge decision.
    grid = linearly_spaced_combinations([(-2.5, 2.5), (-2.5, 2.5)], 100)
    opt = SafeOpt(sparse, grid, fmin=[0.5], threshold=0.05,
                  exact_boundaries=True)
    for t in range(args.iters // 3):
        x = np.asarray(opt.optimize())
        y = float(f_true(x)[0] + 0.02 * rng.normal())
        opt.add_new_data_point(x, y)
        print(f"host iter {t:2d}  x={np.round(x, 3)}  y={y:+.4f}  "
              f"(n={sparse.num_data}, m={sparse.num_inducing}, "
              f"band={opt._band_population})")

    # ---- an on-device campaign with mid-run checkpoint/resume ----------
    from safeopt_tpu.algorithms.runner import run_safeopt_loop

    x0 = np.zeros((1, 2))
    gp = GPRegression(x0, np.array([[2.0]]), RBF(2, variance=2.0),
                      noise_var=1e-4, capacity=64)
    dtype = gp.state.X.dtype

    def f_dev(x):
        return 2.0 * jnp.exp(-0.5 * jnp.sum(x * x))

    grid_dev = jnp.asarray(np.asarray(grid), dtype)
    common = dict(objectives=(f_dev,), noise_std=0.02, chunk=32)
    loop_args = ((gp.kern,), grid_dev, jnp.asarray([0.5], dtype),
                 jnp.asarray(2.0, dtype),
                 jnp.asarray([np.sqrt(2.0)], dtype),
                 jnp.asarray([0.0], dtype))
    n_iter = args.iters
    it_keys = jax.random.split(jax.random.key(7), n_iter)

    half = n_iter // 2
    head = run_safeopt_loop(loop_args[0], (gp.state,), *loop_args[1:],
                            it_keys[0], n_iter=half, it_keys=it_keys[:half],
                            **common)
    ckpt = os.path.join(tempfile.gettempdir(), "campaign_ckpt.npz")
    save_state(ckpt, {"states": head.states, "it_keys": it_keys, "t": half})
    print(f"checkpointed device state at iteration {half} -> {ckpt}")

    ck = load_state(ckpt)                       # "the process restarts"
    tail = run_safeopt_loop(loop_args[0], tuple(ck["states"]),
                            *loop_args[1:], it_keys[0],
                            n_iter=n_iter - half,
                            it_keys=jnp.asarray(ck["it_keys"])[half:],
                            **common)

    full = run_safeopt_loop(loop_args[0], (gp.state,), *loop_args[1:],
                            it_keys[0], n_iter=n_iter, it_keys=it_keys,
                            **common)
    resumed = np.vstack([np.asarray(head.xs), np.asarray(tail.xs)])
    assert np.array_equal(resumed, np.asarray(full.xs)), \
        "resumed trajectory diverged"
    assert bool(np.asarray(full.has_safe).all())
    ys = np.asarray(full.ys)[:, 0]
    print(f"resumed == uninterrupted over {n_iter} device iterations "
          f"(best y {ys.max():+.4f})")

    x_best, lb = opt.get_maximum()
    print(f"best: x={np.round(np.asarray(x_best), 3)} "
          f"lower-bound={float(lb):.4f}")


if __name__ == "__main__":
    main()
