"""Probe: interval-path precision on hardware, path by path.

Compares every production interval route against the XLA HIGHEST
reference on the cap512 bench config (2 RBF GPs, n=500, 1e6 grid):

  xla        _posterior_with_V (HIGHEST, the decision oracle)
  p6_single  fused_intervals(three_pass=False) per GP
  p3_single  fused_intervals(three_pass=True) per GP
  p6_batch   fused_intervals_batched(three_pass=False)
  p3_batch   fused_intervals_batched(three_pass=True)

Prints the max |Q - Q_xla| per path, in scaled units, over a 200k-row
slice (enough rows to expose a noisy pass, small enough to stay fast).
"""

import _bootstrap  # noqa: F401
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

from safeopt_tpu import linearly_spaced_combinations
from safeopt_tpu.algorithms.safe_opt_core import _posterior_with_V
from safeopt_tpu.config import MATMUL_PRECISION
from safeopt_tpu.ops.fused_posterior import (fused_intervals,
                                             fused_intervals_batched)


def main():
    bench._wait_for_backend()
    print("device:", jax.devices()[0], flush=True)

    gp_f, gp_g = bench._cap512_gps()
    kernels = (gp_f.kern, gp_g.kern)
    states = (gp_f.state, gp_g.state)
    dtype = states[0].X.dtype
    grid = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 1000)
    grid_dev = jnp.asarray(np.asarray(grid)[::5], dtype)   # 200k rows
    beta = jnp.asarray(2.0, dtype)

    @jax.jit
    def xla_q():
        cols = []
        with jax.default_matmul_precision(MATMUL_PRECISION):
            for kern, st in zip(kernels, states):
                mu, var, _ = _posterior_with_V(kern, st, grid_dev)
                sig = jnp.sqrt(var)
                cols.extend([mu - beta * sig, mu + beta * sig])
        return jnp.stack(cols, axis=1)

    def pallas_q(batched, three_pass):
        @jax.jit
        def f():
            cols = []
            with jax.default_matmul_precision(MATMUL_PRECISION):
                if batched:
                    for l, u in fused_intervals_batched(
                            kernels, states, grid_dev, beta,
                            three_pass=three_pass):
                        cols.extend([l, u])
                else:
                    for kern, st in zip(kernels, states):
                        l, u = fused_intervals(kern, st, grid_dev, beta,
                                               three_pass=three_pass)
                        cols.extend([l, u])
            return jnp.stack(cols, axis=1)
        return f

    ref = np.asarray(xla_q(), np.float64)
    scal = np.asarray([np.sqrt(2.0), np.sqrt(2.0), 1.0, 1.0])
    out = {}
    for name, batched, tp in (("p6_single", False, False),
                              ("p3_single", False, True),
                              ("p6_batch", True, False),
                              ("p3_batch", True, True)):
        try:
            q = np.asarray(pallas_q(batched, tp)(), np.float64)
            err = np.max(np.abs(q - ref) / scal)
            out[name] = round(float(err), 7)
            print(f"{name:10s} max scaled |dQ| = {err:.3e}", flush=True)
        except Exception as e:  # pragma: no cover - probe
            out[name] = f"fail: {type(e).__name__}"
            print(f"{name:10s} FAILED {type(e).__name__}: {e}", flush=True)
    print(json.dumps(out))

    # Stamp the Pallas surface on a PASS (tools/probe_stamp.py; the
    # snapshot gate refuses an ops/ change without a fresh stamp).
    sys.path.insert(0, "/root/repo/tools")
    import probe_stamp

    ok = all(isinstance(v, float) for v in out.values())
    if ok:
        for name, v in out.items():
            ceiling = (probe_stamp.CEILING_3PASS if name.startswith("p3")
                       else probe_stamp.CEILING_6PASS)
            if v > ceiling:
                print(f"probe: {name} error {v:.3e} exceeds its ceiling "
                      f"{ceiling:.0e} — NOT stamping", flush=True)
                ok = False
    if ok:
        probe_stamp.record("interval_precision", out)
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
