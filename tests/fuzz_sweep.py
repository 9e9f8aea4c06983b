"""Extended offline parity sweep (not collected by pytest).

Runs many random configurations in lockstep with the reference beyond
the committed 20 fuzz tests. Grid sweep last run (round 3, with the
extended kernel draws incl. MLP, RBF+Poly sums and 1-D Cosine*RBF
quasi-periodic products): 30 configurations, zero true divergences,
6 degenerate float64 near-tie forks (selection values equal to
~1e-13, either choice valid). Swarm sweep: 15 seeds, 1 known chaotic
fork — see the section comment below.

Usage: python tests/fuzz_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np
from test_fuzz_parity import _random_case
from safeopt_tpu import SafeOpt
from safeopt_tpu.gp import GPRegression
from reference_impl import RefGP, RefSafeOpt

true_div = 0
forks = 0
for seed in range(100, 130):
    rng = np.random.default_rng(seed)
    grid, kerns, rkerns, fns, fmin, threshold, noise, beta, x0 = _random_case(rng)
    y0 = np.array([[float(f(x0)[0]) for f in fns]])
    gps = [GPRegression(x0, y0[:, [i]], k, noise_var=noise) for i, k in enumerate(kerns)]
    rgps = [RefGP(x0, y0[:, [i]], k, noise_var=noise) for i, k in enumerate(rkerns)]
    opt = SafeOpt(gps if len(gps) > 1 else gps[0], grid, fmin=list(fmin),
                  beta=beta, threshold=threshold)
    ref = RefSafeOpt(rgps if len(rgps) > 1 else rgps[0], grid,
                     fmin=list(fmin), beta=beta, threshold=threshold)
    try:
        for it in range(5):
            x = np.asarray(opt.optimize()); xr = np.asarray(ref.optimize())
            if not np.allclose(x, xr, atol=1e-9):
                l = ref.Q[:, ::2]; u = ref.Q[:, 1::2]
                value = np.max((u - l) / ref.scaling, axis=1)
                io = int(np.argmin(np.sum((ref.inputs - x)**2, axis=1)))
                ir = int(np.argmin(np.sum((ref.inputs - xr)**2, axis=1)))
                gap = abs(value[io] - value[ir])
                if gap < 1e-9 * max(abs(value[ir]), 1e-12):
                    forks += 1
                else:
                    true_div += 1
                    print(f"seed {seed}: TRUE DIVERGENCE iter {it} gap {gap:.3e}", flush=True)
                break
            y = [float(f(x)[0]) for f in fns]
            opt.add_new_data_point(x, np.array([y]))
            ref.add_new_data_point(x, np.array([y]))
    except (EnvironmentError, OSError):
        pass  # unsafe-seed config; skip
print(f"30 seeds: true divergences={true_div}, degenerate forks={forks}", flush=True)

# -- swarm orchestration sweep (round 2) ------------------------------------
# Last run: 15 seeds, 14 exact, 1 chaotic fork (seed 4209: the stepwise
# and fused paths stay BITWISE IDENTICAL to each other on every
# iteration, and both track the NumPy mirror at 1e-15 -> 1e-12 before
# drifting to 7e-5 at iteration 3 — Lyapunov amplification of
# jax-vs-numpy float64 rounding order through the PSO dynamics, not an
# orchestration difference).
from test_fuzz_parity import run_swarm_lockstep_case

swarm_fail = 0
for seed in range(4200, 4215):
    try:
        run_swarm_lockstep_case(seed, iters=5)
    except AssertionError as e:
        swarm_fail += 1
        print(f"swarm seed {seed}: FORKED (check that step==fused and "
              f"earlier iterations matched): {str(e)[:200]}", flush=True)
    except RuntimeError:
        pass  # random config emptied its safe set; legitimate
print(f"15 swarm seeds: forks={swarm_fail} (1 known chaotic fork)",
      flush=True)
