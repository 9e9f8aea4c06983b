"""Run ONLY bench.py's cap512 reduced-precision certified section.

Dev-loop helper for iterating on _refine_Q / certified_scan without
paying the full ~15 min bench: validates the strict-trajectory gate
and the certified step time on hardware after a refine-head change.
"""

import _bootstrap  # noqa: F401
import json
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    bench._wait_for_backend()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from safeopt_tpu import linearly_spaced_combinations

    print("device:", jax.devices()[0], flush=True)
    grid = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 1000)
    grid_dev = jnp.asarray(grid, jnp.float32)
    out = bench._jsonable(bench._cap512_certified_secondary(grid_dev))
    print(json.dumps(out))

    # Stamp the certified path on a PASS (tools/probe_stamp.py; the
    # snapshot gate refuses an ops/ change without a fresh stamp).
    sys.path.insert(0, "/root/repo/tools")
    import probe_stamp

    gates = {k: out.get(k) for k in ("cap512_trajectory_match",
                                     "cap512_safe_set_certified",
                                     "cap512_band_overflow")}
    if (out.get("cap512_trajectory_match")
            and out.get("cap512_safe_set_certified")
            and not out.get("cap512_band_overflow")):
        gates["cap512_certified_ms"] = out.get("cap512_certified_ms")
        probe_stamp.record("cap512", gates)
    else:
        print(f"cap512 probe gates failed: {gates} — NOT stamping",
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
