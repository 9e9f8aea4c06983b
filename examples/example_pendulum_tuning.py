"""Safe PD-controller tuning on a simulated inverted pendulum.

The reference's motivating application is safe controller tuning on
real hardware (README.rst papers [1]-[3]: quadrotor / robot tuning —
never evaluate a gain setting that destabilizes the system). This
example reproduces that shape end to end ON DEVICE: the pendulum
rollout is a ``lax.scan``, so the entire campaign — fused SafeOpt
iteration, closed-loop simulation, exact model update — runs as one
compiled program with zero host round trips
(``algorithms/runner.run_safeopt_loop``).

System: linearized inverted pendulum, theta_ddot = a*theta + b*u with
a = g/l = 4 (unstable), b = 1, controlled by u = -k1*theta - k2*omega.
Tuning domain: (k1, k2) in [0, 12] x [0, 8] on a 101x81 grid.

- objective GP: negative quadratic cost of the rollout (higher =
  better tracking with less effort)
- safety GP: angle margin ``1 - max_t |theta_t| / theta_lim`` — a gain
  pair is SAFE iff the closed loop never exceeds the angle limit.
  fmin = 0: SafeOpt only ever queries controllers it can certify.

Seeded with one conservative stabilizing controller, exactly like the
papers seed with a hand-tuned safe gain set.

``--fleet K`` tunes K DIFFERENT pendulums (pole constants a spread
over [3.2, 6.0]) as one heterogeneous campaign fleet sharded over the
device mesh (``parallel.run_safeopt_campaigns`` with per-campaign
``objective_args``) — the papers' per-system tuning scaled out.

Usage: python examples/example_pendulum_tuning.py [--iters 15]
       [--fleet 8]
"""

import argparse
import os
import sys

# allow running straight from a repo checkout: python examples/<name>.py
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=15)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--fleet", type=int, default=0,
                        help="tune K different pendulums as one "
                             "heterogeneous sharded fleet")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from safeopt_tpu import linearly_spaced_combinations
    from safeopt_tpu.algorithms.runner import run_safeopt_loop
    from safeopt_tpu.gp import GPRegression, RBF

    # -- plant + closed-loop rollout (device-computable) ----------------
    A_COEF, B_COEF, DT, T = 4.0, 1.0, 0.02, 150
    THETA0, THETA_LIM = 0.10, 0.25

    def rollout(gains, a_coef=A_COEF):
        """Closed-loop trajectory stats: (cost, max |theta|)."""
        k1, k2 = gains[0], gains[1]

        def step(state, _):
            theta, omega = state
            u = -k1 * theta - k2 * omega
            omega = omega + DT * (a_coef * theta + B_COEF * u)
            theta = theta + DT * omega
            stage = theta ** 2 + 0.1 * omega ** 2 + 1e-3 * u ** 2
            return (theta, omega), (stage, jnp.abs(theta))

        init = (jnp.asarray(THETA0, gains.dtype),
                jnp.asarray(0.0, gains.dtype))
        _, (stages, aths) = jax.lax.scan(step, init, None, length=T)
        return jnp.sum(stages) * DT, jnp.max(aths)

    def objective(gains):
        cost, _ = rollout(gains)
        # negative cost, scaled to O(1) for the unit-variance GP
        return -cost / 0.05

    def safety(gains):
        _, ath = rollout(gains)
        # angle margin, clipped below so divergent rollouts do not put
        # astronomically negative targets into the GP
        return jnp.maximum(1.0 - ath / THETA_LIM, -3.0)

    if args.fleet:
        _run_fleet(args, rollout)
        return

    # -- safe seed: conservative stabilizing gains -----------------------
    # conservative but distinctly suboptimal (weak proportional
    # gain, ~3x the optimal cost) — the papers' hand-tuned seed
    seed_gains = np.array([[4.8, 1.0]])
    grid = np.asarray(linearly_spaced_combinations(
        [(0.0, 12.0), (0.0, 8.0)], [101, 81]))

    kern_f = RBF(2, variance=4.0, lengthscale=[3.0, 2.0], ARD=True)
    kern_g = RBF(2, variance=1.0, lengthscale=[2.0, 1.5], ARD=True)
    x0 = jnp.asarray(seed_gains)
    y_f0 = float(objective(x0[0]))
    y_g0 = float(safety(x0[0]))
    assert y_g0 > 0.2, "seed controller must be comfortably safe"
    cap = args.iters + 4
    gp_f = GPRegression(seed_gains, np.array([[y_f0]]), kern_f,
                        noise_var=1e-4, capacity=cap)
    gp_g = GPRegression(seed_gains, np.array([[y_g0]]), kern_g,
                        noise_var=1e-4, capacity=cap)

    dtype = gp_f.state.X.dtype
    print(f"seed gains k=({seed_gains[0][0]}, {seed_gains[0][1]}): "
          f"objective {y_f0:+.3f}, safety margin {y_g0:+.3f}")

    # -- the whole campaign as ONE compiled program ----------------------
    res = run_safeopt_loop(
        (kern_f, kern_g), (gp_f.state, gp_g.state), jnp.asarray(grid, dtype),
        jnp.asarray([-np.inf, 0.0], dtype),        # objective unconstrained
        jnp.asarray(3.0, dtype),                    # beta
        jnp.asarray([2.0, 1.0], dtype),             # scaling (prior stds)
        jnp.asarray([0.05, 0.05], dtype),
        jax.random.key(args.seed),
        objectives=(objective, safety), n_iter=args.iters, chunk=64)

    xs = np.asarray(res.xs)
    ys = np.asarray(res.ys)
    assert bool(np.asarray(res.has_safe).all()), "lost certification"

    worst_margin = ys[:, 1].min()
    print(f"\n{args.iters} on-device iterations; safe-set size "
          f"{int(np.asarray(res.safe_counts)[-1])}")
    for i in range(len(xs)):
        print(f"iter {i:3d}  k=({xs[i, 0]:6.3f}, {xs[i, 1]:6.3f})  "
              f"cost={-ys[i, 0] * 0.05:7.4f}  margin={ys[i, 1]:+.3f}")

    # THE safety property: every queried controller kept |theta| within
    # the limit — no rollout ever left the safe envelope.
    assert worst_margin > 0.0, \
        f"SAFETY VIOLATED: margin {worst_margin:+.3f}"
    best = int(np.argmax(ys[:, 0]))
    base_cost = -y_f0 * 0.05
    best_cost = -ys[best, 0] * 0.05
    print(f"\nall {len(xs)} queried controllers stayed within "
          f"|theta| < {THETA_LIM} (worst margin {worst_margin:+.3f})")
    print(f"best: k=({xs[best, 0]:.3f}, {xs[best, 1]:.3f}) "
          f"cost {best_cost:.4f} vs seed {base_cost:.4f} "
          f"({base_cost / best_cost:.2f}x better)")
    assert best_cost < base_cost, "tuning should improve on the seed"


def _run_fleet(args, rollout):
    """K different pendulums (pole constants a in [3.2, 6.0]) tuned as
    one heterogeneous campaign fleet over the mesh."""
    import jax
    import jax.numpy as jnp

    from safeopt_tpu import linearly_spaced_combinations
    from safeopt_tpu.gp import GPRegression, RBF
    from safeopt_tpu.parallel import (make_mesh, run_safeopt_campaigns,
                                      stack_campaign_states)

    K = args.fleet
    THETA_LIM = 0.25
    a_coefs = np.linspace(3.2, 6.0, K)

    def objective(gains, a):
        cost, _ = rollout(gains, a)
        return -cost / 0.05

    def safety(gains, a):
        _, ath = rollout(gains, a)
        return jnp.maximum(1.0 - ath / THETA_LIM, -3.0)

    # each plant seeded with a conservative stabilizer scaled to its a
    grid = np.asarray(linearly_spaced_combinations(
        [(0.0, 12.0), (0.0, 8.0)], [101, 81]))
    kern_f = RBF(2, variance=4.0, lengthscale=[3.0, 2.0], ARD=True)
    kern_g = RBF(2, variance=1.0, lengthscale=[2.0, 1.5], ARD=True)
    cap = args.iters + 4

    per_campaign = []
    for a in a_coefs:
        seed = np.array([[a + 1.5, 1.2]])
        y_f = float(objective(jnp.asarray(seed[0]), a))
        y_g = float(safety(jnp.asarray(seed[0]), a))
        assert y_g > 0.2, f"seed for a={a:.2f} must be safe"
        per_campaign.append((
            GPRegression(seed, np.array([[y_f]]), kern_f, noise_var=1e-4,
                         capacity=cap).state,
            GPRegression(seed, np.array([[y_g]]), kern_g, noise_var=1e-4,
                         capacity=cap).state))

    batched = stack_campaign_states(per_campaign)
    dtype = per_campaign[0][0].X.dtype        # session dtype, not np f64
    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    print(f"heterogeneous fleet: {K} pendulums (a in "
          f"[{a_coefs[0]:.2f}, {a_coefs[-1]:.2f}]) x {args.iters} "
          f"iterations on {n_dev} device(s)")

    fleet = run_safeopt_campaigns(
        (kern_f, kern_g), batched, jnp.asarray(grid, dtype),
        jnp.asarray([-np.inf, 0.0], dtype), jnp.asarray(3.0, dtype),
        jnp.asarray([2.0, 1.0], dtype), jnp.asarray([0.05, 0.05], dtype),
        jax.random.split(jax.random.key(args.seed), K),
        objectives=(objective, safety), n_iter=args.iters,
        mesh=mesh if K % n_dev == 0 else None,
        objective_args_batch=jnp.asarray(a_coefs, dtype), chunk=64)

    xs = np.asarray(fleet.xs)
    ys = np.asarray(fleet.ys)
    assert bool(np.asarray(fleet.has_safe).all()), "lost certification"
    worst = ys[:, :, 1].min()
    for k in range(K):
        best = int(np.argmax(ys[k, :, 0]))
        print(f"plant a={a_coefs[k]:.2f}: best k="
              f"({xs[k, best, 0]:6.3f}, {xs[k, best, 1]:6.3f})  "
              f"cost={-ys[k, best, 0] * 0.05:7.4f}  "
              f"worst margin={ys[k, :, 1].min():+.3f}")
    assert worst > 0.0, f"SAFETY VIOLATED: margin {worst:+.3f}"
    print(f"\nall {K * args.iters} queries across the fleet stayed "
          f"within |theta| < {THETA_LIM} (worst margin {worst:+.3f})")


if __name__ == "__main__":
    main()
