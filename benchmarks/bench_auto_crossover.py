"""Measure the auto-certified crossover capacity (VERDICT r4 #1).

At which GP capacity does the certified 3-pass path (interval_
precision='high' + unified refinement + f64 boundary oracle) become
faster than the plain 6-pass step, END-TO-END through
``SafeOpt.optimize()``?  The answer sets ``AUTO_CERTIFIED_MIN_CAP``
(safeopt_tpu/algorithms/safe_opt.py) — the capacity at and above which
a default-constructed SafeOpt resolves ``interval_precision='auto'``
to the certified path.  Below the crossover the refinement's fixed
cost (top-k + exact-posterior recompute of ~22k rows) outweighs the
halved interval-matmul passes; above it the 3-pass saving on the
(cap, cap) x (cap, B) whitened solves dominates.

Also runs bench._cap512_default_secondary — the driver-facing gate
that a DEFAULT-constructed SafeOpt at cap512 picks the certified path
and dominates the plain opt-out — so a hardware run of this script
validates the whole VERDICT r4 #1 delivery in one TPU claim.

Results land in docs/design.md ("Auto-certified crossover").
"""

import _bootstrap  # noqa: F401
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def _gps(cap, n_obs=None):
    """cap512-bench-shaped GP pair at an arbitrary capacity."""
    from safeopt_tpu.gp import GPRegression, RBF

    rng = np.random.default_rng(0)
    n_obs = n_obs if n_obs is not None else cap - 12
    X = rng.uniform(-4.0, 4.0, size=(n_obs, 2))
    Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
          + 0.05 * rng.normal(size=n_obs))[:, None]
    Yg = (1.0 - 0.1 * np.sum(X ** 2, axis=1)
          + 0.05 * rng.normal(size=n_obs))[:, None]
    gp_f = GPRegression(X, Yf, RBF(2, variance=2.0, lengthscale=1.0),
                        noise_var=0.05 ** 2, capacity=cap)
    gp_g = GPRegression(X, Yg, RBF(2, variance=1.0, lengthscale=1.5),
                        noise_var=0.05 ** 2, capacity=cap)
    return gp_f, gp_g


def _best_ms(fn, reps=5, windows=3):
    best = np.inf
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def main():
    import jax

    bench._wait_for_backend()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from safeopt_tpu import SafeOpt, linearly_spaced_combinations

    print("device:", jax.devices()[0], flush=True)
    grid = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 1000)
    fmin = [0.2, 0.5]

    out = {}
    for cap in (128, 256, 512, 1024):
        plain = SafeOpt(list(_gps(cap)), grid, fmin=fmin,
                        exact_boundaries=False, interval_precision=None)
        cert = SafeOpt(list(_gps(cap)), grid, fmin=fmin,
                       exact_boundaries=True, interval_precision="high")
        x_p = np.asarray(plain.optimize())   # compile + warm
        x_c = np.asarray(cert.optimize())
        ms_p = _best_ms(plain.optimize)
        ms_c = _best_ms(cert.optimize)
        out[f"cap{cap}_plain_ms"] = round(ms_p, 2)
        out[f"cap{cap}_certified_ms"] = round(ms_c, 2)
        out[f"cap{cap}_certified_wins"] = bool(ms_c <= ms_p)
        out[f"cap{cap}_next_match"] = bool(np.array_equal(x_p, x_c))
        print(f"cap={cap:5d}  plain={ms_p:7.2f} ms  "
              f"certified={ms_c:7.2f} ms  "
              f"winner={'certified' if ms_c <= ms_p else 'plain':9s}  "
              f"next_match={out[f'cap{cap}_next_match']}", flush=True)

    print("--- driver-facing default-path gate (cap512) ---", flush=True)
    dflt = bench._jsonable(bench._cap512_default_secondary(grid))
    out.update(dflt)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
