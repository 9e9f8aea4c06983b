"""Benchmark: full fused SafeOpt iteration on a 1e6-point candidate grid.

Measures the end-to-end hot path of one ``optimize()`` call — grid
posterior for every GP, confidence-interval bookkeeping, safe /
maximizer / expander classification (including the early-exit
virtual-observation expander search), and query-point selection — as a
single compiled program on one TPU chip.

Baseline (BASELINE.md): the reference (befelix/SafeOpt on GPy/NumPy)
publishes no numbers; the driver-set north star is a 1e6-point grid
iteration in < 10 ms on one v5e chip. ``vs_baseline`` is the speedup
against that 10 ms target (>1 = faster than target).

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax

    # Persistent compilation cache: the fused programs are compiled
    # through a remote tunnel (~1-4 min each); cached reruns skip it.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from safeopt_tpu import linearly_spaced_combinations
    from safeopt_tpu.algorithms.safe_opt_core import safeopt_step
    from safeopt_tpu.gp import GPRegression, RBF

    rng = np.random.default_rng(0)

    # 2-D problem, 1000 x 1000 grid = 1e6 candidates, 2 GPs
    # (objective + one safety constraint), ~50 observations.
    n_obs = 50
    grid = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 1000)

    X = rng.uniform(-1.5, 1.5, size=(n_obs, 2))
    Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
          + 0.05 * rng.normal(size=n_obs))[:, None]
    Yg = (1.0 - 0.1 * np.sum(X ** 2, axis=1)
          + 0.05 * rng.normal(size=n_obs))[:, None]

    gp_f = GPRegression(X, Yf, RBF(2, variance=2.0, lengthscale=1.0),
                        noise_var=0.05 ** 2, capacity=64)
    gp_g = GPRegression(X, Yg, RBF(2, variance=1.0, lengthscale=1.5),
                        noise_var=0.05 ** 2, capacity=64)

    kernels = (gp_f.kern, gp_g.kern)
    states = (gp_f.state, gp_g.state)
    dtype = states[0].X.dtype

    grid_dev = jnp.asarray(grid, dtype)
    fmin = jnp.asarray([0.2, 0.5], dtype)
    beta = jnp.asarray(2.0, dtype)
    scaling = jnp.asarray([np.sqrt(2.0), 1.0], dtype)
    threshold = jnp.asarray([0.0, 0.0], dtype)

    use_pallas = jax.default_backend() != "cpu"

    def step():
        return safeopt_step(kernels, states, grid_dev, fmin, beta, scaling,
                            threshold, chunk=32, use_pallas=use_pallas)

    # Warmup / compile.
    result = step()
    jax.block_until_ready(result)
    assert bool(result.has_safe), "bench config must have safe points"

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        result = step()
    jax.block_until_ready(result)
    elapsed = (time.perf_counter() - t0) / reps

    points_per_sec = grid.shape[0] / elapsed
    target_ms = 10.0

    # Secondary metrics; never let their failure break the primary line.
    try:
        loop_ms = _fused_loop_secondary(kernels, states, grid_dev, fmin,
                                        beta, scaling, threshold)
    except Exception:
        loop_ms = None
    try:
        swarm_ms = _swarm_secondary()
    except Exception:
        swarm_ms = None

    print(json.dumps({
        "metric": "safeopt_1e6_grid_iteration",
        "value": round(elapsed * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(target_ms / (elapsed * 1e3), 3),
        "points_per_sec": round(points_per_sec),
        "num_gps": 2,
        "n_obs": n_obs,
        "device": str(jax.devices()[0]),
        "pallas": use_pallas,
        "fused_loop_ms_per_iter": loop_ms,
        "swarm_10d_iteration_ms": swarm_ms,
    }))


def _fused_loop_secondary(kernels, states, grid_dev, fmin, beta, scaling,
                          threshold):
    """Complete BO iterations (step + observe + model update) under one
    lax.scan dispatch — the zero-host-round-trip serving path."""
    import time

    import jax
    import jax.numpy as jnp

    from safeopt_tpu.algorithms.runner import run_safeopt_loop

    def f_dev(x):
        return 2.0 * jnp.exp(-0.5 * jnp.sum(x * x))

    def g_dev(x):
        return 1.0 - 0.1 * jnp.sum(x * x)

    n_iter = 10

    def call(key):
        return run_safeopt_loop(
            kernels, states, grid_dev, fmin, beta, scaling, threshold,
            key, objectives=(f_dev, g_dev), n_iter=n_iter,
            noise_std=0.02, chunk=64, use_pallas=True)

    r = call(jax.random.key(0))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(3):
        r = call(jax.random.key(i + 1))
    jax.block_until_ready(r)
    return round((time.perf_counter() - t0) / 3 / n_iter * 1e3, 2)


def _swarm_secondary():
    import time

    import jax

    from safeopt_tpu import SafeOptSwarm
    from safeopt_tpu.gp import GPRegression, RBF

    rng = np.random.default_rng(0)
    d, n0 = 10, 5
    X = rng.uniform(-0.5, 0.5, size=(n0, d))
    Y = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1)))[:, None]
    gp = GPRegression(X, Y, RBF(d, variance=2.0, lengthscale=2.0),
                      noise_var=0.01)
    opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[(-3.0, 3.0)] * d,
                       swarm_size=20, key=jax.random.key(0))
    opt.optimize()  # compile
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        opt.optimize()
    return round((time.perf_counter() - t0) / reps * 1e3, 1)


if __name__ == "__main__":
    main()
