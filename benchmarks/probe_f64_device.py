"""Probe: can the knife-edge f64 oracle run ON the TPU?

The certified path's flip cost is dominated by host round trips: pull
the packed band buffer (1 RTT), host f64 oracle, correction dispatch +
diag pull (1 more RTT). If the device can evaluate the f64 lower
bounds of the <=k band rows itself (XLA emulates F64 on TPU), the
oracle and the correction fold into the ONE certified dispatch and the
flip overhead disappears. This probe answers, on real hardware:

1. does f64 matmul/sqrt/compare compile and run on the axon TPU?
2. how fast is the oracle-shaped workload (k x cap f64 matmul)?
3. do the resulting SAFETY DECISIONS match the host (NumPy) f64
   oracle on a cap512-shaped problem — including knife-edge rows?

Also re-measures end-to-end SafeOpt.optimize() at cap512 after the
round-5 device-operand caching, attributing the remaining gap.
"""

import _bootstrap  # noqa: F401
import time

import numpy as np

import sys
sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def probe_f64():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    k, cap = 1024, 512
    A = rng.normal(size=(k, cap))
    B = rng.normal(size=(cap, cap))

    with jax.enable_x64(True):
        Ad = jnp.asarray(A, jnp.float64)
        Bd = jnp.asarray(B, jnp.float64)

        @jax.jit
        def oracle_shape(a, b):
            v = a @ b                  # (k, cap) f64 matmul
            mu = jnp.sum(v * v, axis=1)
            return mu - 2.0 * jnp.sqrt(jnp.abs(mu) + 1.0)

        try:
            out = np.asarray(oracle_shape(Ad, Bd))
        except Exception as e:
            print(f"f64_supported: False ({type(e).__name__}: {e})",
                  flush=True)
            return False
        ref = (lambda v: (lambda mu: mu - 2.0 * np.sqrt(np.abs(mu) + 1.0))(
            np.sum(v * v, axis=1)))(A @ B)
        bit_equal = bool(np.array_equal(out, ref))
        max_rel = float(np.max(np.abs(out - ref)
                               / np.maximum(np.abs(ref), 1e-300)))
        # timing: chain reps in one program, vary the operand
        from functools import partial

        @partial(jax.jit, static_argnames=("reps",))
        def timed(a, b, *, reps):
            def body(i, acc):
                v = (a + acc * 1e-30) @ b
                return jnp.maximum(acc, jnp.max(v) * 1e-30)
            return jax.lax.fori_loop(0, reps, body, jnp.float64(0.0))

        def t(reps):
            float(timed(Ad, Bd, reps=reps))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(timed(Ad, Bd, reps=reps))
                best = min(best, time.perf_counter() - t0)
            return best

        ms = (t(9) - t(1)) / 8 * 1e3
        print(f"f64_supported: True  bit_equal_vs_numpy: {bit_equal}  "
              f"max_rel_err: {max_rel:.3g}  "
              f"oracle_matmul_ms (k=1024,cap=512): {ms:.3f}", flush=True)
        return True


def remeasure_cap512():
    import jax

    from safeopt_tpu import SafeOpt, linearly_spaced_combinations

    grid = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 1000)
    fmin = [0.2, 0.5]

    def build():
        gp_f, gp_g = bench._cap512_gps()
        return [gp_f, gp_g]

    def best_ms(fn, reps=5, windows=3):
        best = np.inf
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            best = min(best, (time.perf_counter() - t0) / reps * 1e3)
        return best

    plain = SafeOpt(build(), grid, fmin=fmin,
                    exact_boundaries=False, interval_precision=None)
    plain.optimize()
    ms_plain = best_ms(plain.optimize)
    print(f"plain optimize() end-to-end: {ms_plain:.2f} ms", flush=True)

    full = SafeOpt(build(), grid, fmin=fmin,
                   exact_boundaries=True, interval_precision=None,
                   boundary_k=2048)
    full.optimize()
    ms_full = best_ms(full.optimize)
    print(f"fullprec certified optimize(): {ms_full:.2f} ms "
          f"(band={full._band_population}, "
          f"flips={full._certified_corrections}, "
          f"overflow={full._band_overflow})", flush=True)

    cert = SafeOpt(build(), grid, fmin=fmin,
                   exact_boundaries=True, interval_precision="high",
                   boundary_k=2048)
    cert.optimize()
    ms_cert = best_ms(cert.optimize)
    print(f"3-pass certified optimize(): {ms_cert:.2f} ms "
          f"(band={cert._band_population}, "
          f"flips={cert._certified_corrections}, "
          f"overflow={cert._band_overflow})", flush=True)

    # --- the round-5 device-oracle path: settle knife edges on the TPU
    for prec, label in ((None, "fullprec"), ("high", "3-pass")):
        devo = SafeOpt(build(), grid, fmin=fmin,
                       exact_boundaries=True, interval_precision=prec,
                       boundary_k=2048, oracle="device")
        x_dev = np.asarray(devo.optimize())
        ms_devo = best_ms(devo.optimize)
        ref = full if prec is None else cert
        x_ref = np.asarray(ref.optimize())
        traj = (bool(np.array_equal(x_dev, x_ref))
                and bool(np.array_equal(devo.S, ref.S))
                and bool(np.array_equal(devo.M, ref.M))
                and bool(np.array_equal(devo.G, ref.G)))
        print(f"{label} certified optimize() DEVICE oracle: "
              f"{ms_devo:.2f} ms (band={devo._band_population}, "
              f"flips={devo._certified_corrections}, "
              f"host-oracle match={traj})", flush=True)


def main():
    import jax

    bench._wait_for_backend()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)
    probe_f64()
    remeasure_cap512()


if __name__ == "__main__":
    main()
