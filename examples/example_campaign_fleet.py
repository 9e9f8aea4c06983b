"""Campaign-parallel BO fleet across the device mesh (new capability,
no reference counterpart — SURVEY.md section 2.10: the reference is a
single-process numpy program).

Runs K independent on-device SafeOpt campaigns — different safe seeds,
different noise streams, one shared objective — as ONE compiled
program with the campaign axis sharded over a ``jax.sharding.Mesh``:
one-or-more campaigns per chip, zero cross-chip communication inside
the loop. The fleet shape is the reference's own target domain scaled
out: per-system controller tuning, multi-seed robustness studies.

On a single-chip session the mesh has one device and the fleet still
runs (vmapped); to see true multi-device placement use the CPU
virtual mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
    JAX_PLATFORMS=cpu python examples/example_campaign_fleet.py

Usage: python examples/example_campaign_fleet.py [--campaigns 8]
       [--iters 6]
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
    parser.add_argument("--campaigns", type=int, default=8)
    parser.add_argument("--iters", type=int, default=6)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from safeopt_tpu import linearly_spaced_combinations
    from safeopt_tpu.gp import GPRegression, RBF
    from safeopt_tpu.parallel import (make_mesh, run_safeopt_campaigns,
                                      stack_campaign_states)

    K = args.campaigns
    kern = RBF(2, variance=2.0, lengthscale=1.2)

    def objective(x):
        return 2.0 * jnp.exp(-0.5 * jnp.sum(x * x))

    # K campaigns, each seeded at a different (safe) starting point.
    rng = np.random.default_rng(0)
    per_campaign = []
    for _ in range(K):
        x0 = rng.uniform(-0.4, 0.4, size=(1, 2))
        y0 = 2.0 * np.exp(-0.5 * np.sum(x0 ** 2))
        gp = GPRegression(x0, np.array([[y0]]), kern, noise_var=1e-4,
                          capacity=max(16, args.iters + 2))
        per_campaign.append((gp.state,))

    grid = jnp.asarray(np.asarray(linearly_spaced_combinations(
        [(-2.0, 2.0), (-2.0, 2.0)], 33)))
    dtype = grid.dtype
    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    print(f"fleet: {K} campaigns x {args.iters} iterations on "
          f"{n_dev} device(s)")

    fleet = run_safeopt_campaigns(
        (kern,), stack_campaign_states(per_campaign), grid,
        jnp.asarray([0.5], dtype), jnp.asarray(2.0, dtype),
        jnp.asarray([np.sqrt(2.0)], dtype), jnp.asarray([0.0], dtype),
        jax.random.split(jax.random.key(0), K),
        objectives=(objective,), n_iter=args.iters,
        mesh=mesh if K % n_dev == 0 else None, chunk=16)

    xs = np.asarray(fleet.xs)                      # (K, T, d)
    ys = np.asarray(fleet.ys)[:, :, 0]             # (K, T)
    ok = np.asarray(fleet.has_safe).all(axis=1)    # (K,)
    for k in range(K):
        best = ys[k].max()
        tag = "ok " if ok[k] else "LOST-CERT"
        print(f"campaign {k}: best y = {best:+.4f}  "
              f"final x = {np.round(xs[k, -1], 3)}  [{tag}]")
    kbest = int(ys.max(axis=1).argmax())
    print(f"\nfleet best: campaign {kbest}, y = {ys[kbest].max():.4f}")
    assert ok.all(), "a campaign lost safety certification"


if __name__ == "__main__":
    main()
