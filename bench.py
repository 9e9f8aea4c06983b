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

Round-2 additions (VERDICT.md):
- ``pallas_parity``: the identical 1e6-grid step with use_pallas=True
  and False must produce the same S/M/G/next_idx (the interval
  comparisons of reference gp_opt.py:453-481) — gates the compiled
  Mosaic kernels against the XLA path ON REAL HARDWARE, where bf16
  passes / tile padding / accumulator dtype bugs live.
- ``safeopt_cap512_ms``: capacity-512 (500 obs) hard mode — the
  (cap,cap)x(cap,B) whitened solve dominates. ``cap512_floor_ms``
  reports the measured pure-MXU floor of that solve (two GPs, 6-pass
  f32, lower-triangular tiles): the step cannot beat the floor without
  dropping matmul precision, and a measured bf16 3-pass emulation
  costs 20x the decision accuracy (1e-2 vs 5e-4 abs vs f64 truth
  through the kappa~1e6 factor) for <10% speed — rejected;
  ``cap512_vs_floor`` states how close the full step gets.
- ``expander_stress_ms``: a config where no candidate passes the
  expander test, forcing the chunked while_loop to walk every
  candidate (the worst case of reference gp_opt.py:557-612).
- ``swarm_*``: 10-d SafeOptSwarm iteration attributed into device
  compute vs host+tunnel, for 1-GP and 2-GP configs.
- ``context_kernel_*``: the reference's contextual product kernel
  through the fused sum-of-products Pallas path vs XLA, with a
  decision-parity gate on hardware.
- ``fleet_*``: K vmapped on-device campaigns in one program — the
  amortized per-campaign-iteration cost when serving fleets
  (parallel/campaigns.py).

Prints ONE JSON line.
"""

import json
import time

import numpy as np

TARGET_MS = 10.0

# v5e (TPU v5 lite) peak bf16 MXU throughput; f32-HIGHEST matmuls run
# as 6 bf16 passes, the 3-pass emulated precision as 3.
V5E_BF16_TFLOPS = 197.0


def _mxu_floor_ms(cap: int, n_grid: int, num_gps: int,
                  passes: int) -> float:
    """MXU-bound time of the step's dominant matmul at its shapes.

    The whitened solve ``V = Linv @ K(X, grid)`` is (cap, cap) x
    (cap, N) per GP; the lower-triangular tile skip keeps
    t(t+1)/2 of t^2 MXU tiles (t = cap/128, no skip below one tile).
    Everything else in the step (grams, epilogues, classification) is
    VPU/HBM work the roofline fraction deliberately charges against.
    """
    t = cap / 128.0
    tri = ((t * (t + 1) / 2) / (t * t)) if t > 1 else 1.0
    flops = 2.0 * cap * cap * n_grid * num_gps * passes * tri
    return flops / (V5E_BF16_TFLOPS * 1e12) * 1e3


def _build_gps(rng, n_obs, capacity, d=2, spread=1.5):
    from safeopt_tpu.gp import GPRegression, RBF

    X = rng.uniform(-spread, spread, size=(n_obs, d))
    Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
          + 0.05 * rng.normal(size=n_obs))[:, None]
    Yg = (1.0 - 0.1 * np.sum(X ** 2, axis=1)
          + 0.05 * rng.normal(size=n_obs))[:, None]
    gp_f = GPRegression(X, Yf, RBF(d, variance=2.0, lengthscale=1.0),
                        noise_var=0.05 ** 2, capacity=capacity)
    gp_g = GPRegression(X, Yg, RBF(d, variance=1.0, lengthscale=1.5),
                        noise_var=0.05 ** 2, capacity=capacity)
    return gp_f, gp_g


def _time_step(step_fn, reps):
    import jax

    result = step_fn()                     # warmup / compile
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(reps):
        result = step_fn()
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / reps, result


def _wait_for_backend(max_wait_s: float = 1500.0) -> None:
    """Ride out a transient tunnel outage before touching the device.

    The remote-TPU tunnel occasionally wedges or restarts (observed:
    ``jax.devices()`` blocking for minutes, then ``UNAVAILABLE: TPU
    backend setup/compile error``); a bench launched into that window
    would burn its whole run on one doomed backend init. Probe in a
    SUBPROCESS (a blocked ``jax.devices()`` cannot be timed out
    in-process) until it answers or the budget runs out; on timeout
    fall through and let the real init raise its own error. Killed
    probes re-wedge the tunnel for minutes, so attempts are spaced
    by the documented recovery window.
    """
    import subprocess
    import sys

    # The resolved platform list, not the env var: sitecustomize
    # re-forces jax_platforms='axon,cpu' via jax.config at every
    # interpreter start, so `env JAX_PLATFORMS=cpu` does NOT stick
    # (CLAUDE.md) — gating on the env var would silently disable the
    # outage protection on a forced-axon run.
    import jax

    platforms = jax.config.jax_platforms or "axon"
    if "axon" not in platforms:
        return   # CPU runs have nothing to wait for
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=150)
            if probe.returncode == 0:
                if attempt > 1:
                    print(f"backend probe ok after {attempt} attempts",
                          flush=True)
                time.sleep(3.0)   # let the terminal release the claim
                return
        except subprocess.TimeoutExpired:
            # the probe died mid-claim; a killed claim wedges the
            # tunnel for ~3-5 min (CLAUDE.md) — re-probing sooner
            # would keep re-wedging it
            pass
        if time.time() > deadline:
            print("backend probe never succeeded; proceeding anyway",
                  flush=True)
            return
        time.sleep(240.0)


def main():
    import jax

    _wait_for_backend()

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
    gp_f, gp_g = _build_gps(rng, n_obs, capacity=64)

    kernels = (gp_f.kern, gp_g.kern)
    states = (gp_f.state, gp_g.state)
    dtype = states[0].X.dtype

    grid_dev = jnp.asarray(grid, dtype)
    fmin = jnp.asarray([0.2, 0.5], dtype)
    beta = jnp.asarray(2.0, dtype)
    scaling = jnp.asarray([np.sqrt(2.0), 1.0], dtype)
    threshold = jnp.asarray([0.0, 0.0], dtype)

    use_pallas = jax.default_backend() != "cpu"

    def step(pallas=use_pallas):
        return safeopt_step(kernels, states, grid_dev, fmin, beta, scaling,
                            threshold, chunk=32, use_pallas=pallas)

    elapsed, result = _time_step(step, reps=20)
    assert bool(result.has_safe), "bench config must have safe points"
    points_per_sec = grid.shape[0] / elapsed

    out = {
        "metric": "safeopt_1e6_grid_iteration",
        "value": round(elapsed * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / (elapsed * 1e3), 3),
        # BASELINE.json's north-star metric, reported directly
        # (VERDICT r3 #9): candidate-grid points/sec per chip for the
        # full posterior+classification step.
        "step_points_per_sec": round(points_per_sec),
        "points_per_sec": round(points_per_sec),
        # achieved fraction of the MXU-bound floor at this step's
        # shapes (cap=64 < one MXU tile: the flagship is latency/VPU
        # bound, not matmul bound — the honest reading is that the
        # matmul is nearly free at this capacity)
        "flagship_mxu_floor_ms": round(_mxu_floor_ms(64, grid.shape[0],
                                                     2, 6), 3),
        "flagship_roofline_fraction": round(
            _mxu_floor_ms(64, grid.shape[0], 2, 6) / (elapsed * 1e3), 3),
        "num_gps": 2,
        "n_obs": n_obs,
        "device": str(jax.devices()[0]),
        "pallas": use_pallas,
    }

    # Pure device time for the same step, measured with the in-program
    # protocol (reps chained inside ONE jit via lax.fori_loop, operands
    # perturbed from the carry, the whole result consumed, reps=1 vs
    # reps=11 differenced). The host-loop `value` above includes
    # per-dispatch tunnel overhead that drifts day to day (the SAME
    # round-3 commit measured 3.5 ms and 5.0 ms on different days while
    # this in-program number held); on a directly attached TPU the two
    # converge, so this is the per-chip throughput number.
    def chained(g0, reps):
        def body(i, carry):
            b, acc = carry
            r = safeopt_step(kernels, states, grid_dev * b, fmin, beta,
                             scaling, threshold, chunk=32,
                             use_pallas=use_pallas)
            tot = (r.next_idx.astype(jnp.float32)
                   + r.safe_count.astype(jnp.float32)
                   + r.maximizer_count.astype(jnp.float32)
                   + jnp.max(r.Q))
            return b + (tot % 2) * 1e-12, acc + tot
        return jax.lax.fori_loop(
            0, reps, body, (g0, jnp.zeros((), jnp.float32)))[1]

    try:
        chained_j = jax.jit(chained, static_argnames=("reps",))
        one = jnp.asarray(1.0, dtype)
        # reps is static: warm up BOTH programs before any timed window
        float(chained_j(one, 1))
        float(chained_j(one, 11))
        # Difference the BEST-OF of each window series separately: a
        # tunnel hiccup inflating one t1 paired with a clean t11 would
        # otherwise bias (t11 - t1) low.
        t1s, t11s = [], []
        for k in range(3):
            t0 = time.perf_counter()
            float(chained_j(one * (1 + 1e-9 * (2 * k + 1)), 1))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(chained_j(one * (1 + 1e-9 * (2 * k + 2)), 11))
            t11s.append(time.perf_counter() - t0)
        dev_ms = (min(t11s) - min(t1s)) / 10 * 1e3
        out["flagship_device_ms"] = round(dev_ms, 3)
        out["step_points_per_sec_device"] = round(grid.shape[0]
                                                  / (dev_ms / 1e3))
    except Exception as e:  # pragma: no cover - diagnostics only
        out["flagship_device_ms_error"] = f"{type(e).__name__}: {e}"

    # Host-observed latency context: any BLOCKING sync through this
    # remote tunnel costs ~30 ms round trip (measured on a trivial
    # jitted op), so every per-iteration e2e number below decomposes as
    # step + one mandatory sync — on directly attached TPUs the floor
    # vanishes and the step time is the iteration time.
    tiny = jax.jit(lambda v: v * 2 + 1)
    y0 = jnp.zeros(4)
    jax.block_until_ready(tiny(y0))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(tiny(y0))
    out["tunnel_sync_floor_ms"] = round((time.perf_counter() - t0) / 10
                                        * 1e3, 2)

    # Secondary metrics; never let their failure break the primary line.
    extras = [
        ("pallas-parity", lambda: _pallas_parity_gate(step, result)),
        ("certified", lambda: _certified_secondary(gp_f, gp_g, grid)),
        ("cap512", lambda: _cap512_secondary(rng, grid_dev)),
        ("cap512-certified", lambda: _cap512_certified_secondary(grid_dev)),
        ("cap512-default", lambda: _cap512_default_secondary(grid)),
        ("expander-stress", lambda: _expander_stress_secondary()),
        ("context-kernel", lambda: _context_kernel_secondary(grid_dev)),
        ("deploy", lambda: _deploy_secondary(
            kernels, states, grid_dev, fmin, beta, scaling, threshold)),
        ("sparse", lambda: _sparse_secondary(grid_dev)),
        ("fused-loop", lambda: _fused_loop_secondary(
            kernels, states, grid_dev, fmin, beta, scaling, threshold)),
        ("swarm", lambda: _swarm_secondary()),
        ("fleet", lambda: _fleet_secondary()),
        ("grid-pipeline", lambda: _grid_pipeline_secondary(rng, grid)),
        ("hyperopt", lambda: _hyperopt_secondary()),
        ("notebook", lambda: _notebook_fulllength_secondary()),
    ]
    for name, fn in extras:
        try:
            out.update(fn())
        except Exception as e:  # pragma: no cover - diagnostics only
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"

    full = _jsonable(out)
    # (a) The COMPLETE record goes to a committed file: the driver's
    # BENCH_r{N}.json keeps only a ~4 KB tail of stdout, which round 4
    # truncated mid-JSON and cost the judge a 15-minute rerun
    # (VERDICT r4 #2). BENCH_FULL.json at the snapshot commit is the
    # auditable artifact.
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FULL.json")
    with open(path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
        f.write("\n")
    # (b) stdout: full line first (humans / logs), compact gates-only
    # line LAST so the driver's tail always captures a parseable JSON
    # object holding the headline number and every gate.
    print(json.dumps(full))
    print(json.dumps(_compact_gates(full)))


def _compact_gates(full):
    """<=1.5 KB summary: headline metric + every boolean gate + the
    handful of ms rows the round's claims live in. The driver records
    the tail of stdout; this line is sized to survive any truncation
    window and parse on its own."""
    keep = ("metric", "value", "unit", "vs_baseline", "step_points_per_sec",
            "flagship_device_ms", "safeopt_cap512_ms", "cap512_certified_ms",
            "cap512_certified_device_ms", "cap512_default_ms",
            "certified_step_ms", "certified_noflip_step_ms",
            "sparse_recommended_drift_conservative",
            "sparse_recommended_drift_optimistic",
            "swarm_10d_total_ms", "swarm_10d_pipelined_ms",
            "fleet_ms_per_campaign_iter", "hyperopt_restarts_ms",
            "expander_stress_mean_ms", "tunnel_sync_floor_ms")
    compact = {k: full[k] for k in keep if k in full}
    for k, v in sorted(full.items()):
        if isinstance(v, bool):
            compact[k] = v
        elif k.endswith("_error"):
            compact[k] = str(v)[:60]
    # hard cap: drop the least important tail keys before ever
    # exceeding the driver's capture budget
    while len(json.dumps(compact)) > 1500:
        for k in reversed(list(compact)):
            if k not in ("metric", "value", "unit", "vs_baseline"):
                del compact[k]
                break
    return compact


def _jsonable(obj):
    """Map numpy scalars/arrays to JSON-safe python values, recursively
    (a stray np.bool_ must never lose a 40-minute hardware run at the
    final print)."""
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.bool_):
        return bool(obj)
    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


# ---------------------------------------------------------------------------
# VERDICT item 2: Pallas-vs-XLA decision parity on the real chip
# ---------------------------------------------------------------------------

def _pallas_parity_gate(step, result_pallas, fmin_np=(0.2, 0.5),
                        scaling_np=(np.sqrt(2.0), 1.0)):
    """Same step, XLA path: decisions must match outside the f32 band.

    Protects the interval comparisons of reference gp_opt.py:453-481
    against the Mosaic-kernel bug class (bf16 passes, tile padding,
    accumulator dtype) that only exists on real hardware.

    Both paths carry ~1e-4 absolute f32 noise on a 1e6-point grid
    (measured against the f64 host truth; the Pallas difference-form
    grams are the *closer* of the two). A safe-set flip at a point
    whose true margin ``|l - fmin|`` sits inside that band is a
    legitimate tie either implementation may call — the gate counts a
    mismatch as MATERIAL only when the decision margin exceeds the
    band (scaled per GP), so a real kernel bug (wrong tile, bf16
    accumulation) still trips it while knife-edge ties do not.
    """
    import jax

    band = 1e-3   # ~10x the measured f32 noise floor, in scaled units

    elapsed_xla, result_xla = _time_step(lambda: step(pallas=False), reps=5)

    a = jax.device_get((result_pallas.S, result_pallas.M, result_pallas.G,
                        result_pallas.next_idx, result_pallas.Q))
    b = jax.device_get((result_xla.S, result_xla.M, result_xla.G,
                        result_xla.next_idx, result_xla.Q))
    l_xla = b[4][:, 0::2]
    margin = np.min(
        np.abs(l_xla - np.asarray(fmin_np)) / np.asarray(scaling_np), axis=1)
    benign = margin < band

    mism = {}
    material = {}
    for name, x, y in (("S", a[0], b[0]), ("M", a[1], b[1]),
                       ("G", a[2], b[2])):
        diff = x != y
        mism[name] = int(np.count_nonzero(diff))
        material[name] = int(np.count_nonzero(diff & ~benign))
    mism["next_idx"] = material["next_idx"] = int(a[3] != b[3])

    q_diff = float(np.max(np.abs(a[4] - b[4])))
    q_close = q_diff < 1e-3   # f32 full-grid regime
    parity = all(v == 0 for v in material.values()) and q_close
    return {
        "pallas_parity": parity,
        "pallas_mismatches": mism,
        "pallas_material_mismatches": material,
        "pallas_max_q_diff": round(q_diff, 7),
        "q_within_tol": q_close,
        "xla_ms": round(elapsed_xla * 1e3, 3),
    }


# ---------------------------------------------------------------------------
# boundary-certified iteration (f64-exact safe decisions on f32 hardware)
# ---------------------------------------------------------------------------

def _certified_secondary(gp_f, gp_g, grid):
    """End-to-end SafeOpt with exact_boundaries on the 1e6 grid: the
    two-pass latency plus how many f32 boundary calls the f64 oracle
    actually overturned."""
    import jax

    from safeopt_tpu import SafeOpt

    def windows(fn, reps=5, k=3):
        """Best of k short averaging windows: each optimize() pays one
        mandatory blocking sync whose tunnel latency is bimodal (see
        the expander-stress note) — the best window tracks the
        iteration, not the tunnel."""
        best = np.inf
        for _ in range(k):
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            best = min(best, (time.perf_counter() - t0) / reps * 1e3)
        return best

    opt = SafeOpt([gp_f, gp_g], grid, fmin=[0.2, 0.5],
                  exact_boundaries=True, boundary_band=1e-3)
    plain = SafeOpt([gp_f, gp_g], grid, fmin=[0.2, 0.5],
                    exact_boundaries=False)
    opt.optimize()                       # compile both passes
    reps = 5
    cert_ms = windows(opt.optimize)
    plain.optimize()
    plain_ms = windows(plain.optimize)
    S_cert = opt.S
    S_plain = plain.S

    # VERDICT r4 #8 evidence: the host-oracle protocol this round's
    # on-device settlement replaced (2 host round trips + host predict
    # + redundant re-classification per flipping iteration)
    host_o = SafeOpt([gp_f, gp_g], grid, fmin=[0.2, 0.5],
                     exact_boundaries=True, boundary_band=1e-3,
                     oracle="host")
    x_h = np.asarray(host_o.optimize())
    host_ms = windows(host_o.optimize)
    oracle_match = (bool(np.array_equal(np.asarray(opt.optimize()), x_h))
                    and bool(np.array_equal(opt.S, host_o.S)))

    # Optimistic-protocol demonstration (VERDICT r2 weak #3): with no
    # candidate inside the ambiguity band — the common case once a run
    # converges, here forced by thresholds far from every posterior —
    # the certified step is ONE dispatch + one packed pull, i.e. the
    # plain optimize() latency.
    from safeopt_tpu.gp import GPRegression
    gps2 = [GPRegression(np.asarray(g.X_host), np.asarray(g.Y_host),
                         g.kern, noise_var=g.noise_var, capacity=64)
            for g in (gp_f, gp_g)]
    noflip = SafeOpt(gps2, grid, fmin=[-50.0, -50.0],
                     exact_boundaries=True, boundary_band=1e-3)
    noflip.optimize()
    noflip_ms = windows(noflip.optimize)

    return {
        "certified_step_ms": round(cert_ms, 3),
        "certified_overhead_ms": round(cert_ms - plain_ms, 3),
        "plain_optimize_ms": round(plain_ms, 3),
        "certified_oracle": opt._oracle,
        "certified_host_oracle_step_ms": round(host_ms, 3),
        "certified_device_vs_host_match": oracle_match,
        # VERDICT r4 #8 target: certified WITH flips <= ~55 ms
        "certified_step_under_55ms": bool(cert_ms <= 55.0),
        "certified_flips": int(np.count_nonzero(S_cert != S_plain)),
        "certified_band_population": int(opt._band_population),
        "certified_corrections": int(opt._certified_corrections),
        "certified_noflip_step_ms": round(noflip_ms, 3),
        "certified_noflip_band_population": int(noflip._band_population),
    }


# ---------------------------------------------------------------------------
# VERDICT item 4a: capacity-512 hard mode
# ---------------------------------------------------------------------------

def _cap512_secondary(rng, grid_dev):
    """1e6-grid iteration at capacity 512 (500 observations): the
    (cap,cap)x(cap,B) whitened solve dominates the interval pass."""
    import jax
    import jax.numpy as jnp

    from safeopt_tpu.algorithms.safe_opt_core import safeopt_step

    gp_f, gp_g = _build_gps(rng, n_obs=500, capacity=512, spread=4.0)
    kernels = (gp_f.kern, gp_g.kern)
    states = (gp_f.state, gp_g.state)
    dtype = states[0].X.dtype
    fmin = jnp.asarray([0.2, 0.5], dtype)
    use_pallas = jax.default_backend() != "cpu"

    def step():
        return safeopt_step(kernels, states, grid_dev, fmin,
                            jnp.asarray(2.0, dtype),
                            jnp.asarray([np.sqrt(2.0), 1.0], dtype),
                            jnp.asarray([0.0, 0.0], dtype),
                            chunk=32, use_pallas=use_pallas)

    elapsed, result = _time_step(step, reps=10)
    assert bool(result.has_safe)

    # Pure-MXU floor of the dominant cost: the (cap,cap)x(cap,B)
    # whitened solve per GP at 6-pass f32 with lower-triangular tile
    # skipping (10/16 of the square tiles at cap=512). Measured, not
    # modeled: one raw square matmul, scaled by 2 GPs x 10/16.
    import time as _time
    cap = 512
    A = jnp.asarray(np.tril(np.random.default_rng(1).normal(
        size=(cap, cap))), jnp.float32)
    Bm = jnp.asarray(np.random.default_rng(2).normal(
        size=(cap, grid_dev.shape[0])), jnp.float32)
    # chain reps inside one program (the remote runtime elides
    # repeated identical dispatches) and difference 1 vs 6 reps
    from functools import partial

    @partial(jax.jit, static_argnames=("reps",))
    def mm_reps(a, b, *, reps):
        def body(i, acc):
            # max() consumes the whole product (a [0,0]-slice would let
            # XLA collapse the matmul to one row); HIGHEST = the
            # decision-path 6-pass f32 precision (config.py invariant).
            p = jax.lax.dot(a, b + acc * 1e-12,
                            precision=jax.lax.Precision.HIGHEST)
            return jnp.maximum(acc, jnp.max(p) * 1e-12)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    def t(reps):
        float(mm_reps(A, Bm, reps=reps))          # compile + warm
        t0 = _time.perf_counter()
        float(mm_reps(A, Bm, reps=reps))
        return _time.perf_counter() - t0

    floor_ms = (t(6) - t(1)) / 5 * 1e3 * 2 * (10.0 / 16.0)

    return {
        "safeopt_cap512_ms": round(elapsed * 1e3, 3),
        "cap512_under_target": elapsed * 1e3 < TARGET_MS,
        "cap512_floor_ms": round(floor_ms, 2),
        "cap512_vs_floor": round(elapsed * 1e3 / max(floor_ms, 1e-9), 2),
        "cap512_points_per_sec": round(grid_dev.shape[0] / elapsed),
        # analytic MXU-bound floor at these shapes (6-pass f32, tri
        # skip) and the achieved fraction — VERDICT r3 #9
        "cap512_mxu_floor_ms": round(
            _mxu_floor_ms(512, grid_dev.shape[0], 2, 6), 2),
        "cap512_roofline_fraction": round(
            _mxu_floor_ms(512, grid_dev.shape[0], 2, 6) / (elapsed * 1e3),
            3),
    }


# ---------------------------------------------------------------------------
# VERDICT r2 item 1: below the MXU floor — reduced-precision intervals
# certified by the f64 boundary machinery
# ---------------------------------------------------------------------------


def _cap512_gps():
    rng = np.random.default_rng(0)
    from safeopt_tpu.gp import GPRegression, RBF

    n_obs, cap = 500, 512
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


def _cap512_certified_secondary(grid_dev, boundary_band=1e-3,
                                refine_band=1e-2, refine_band_k=20480,
                                k=4096, precision="high"):
    """The route below the 6-pass-f32 MXU floor: run the cap512
    interval pass at 3-pass precision (emulated in the Mosaic kernel —
    `_dot3` hi/lo bf16 split; single-pass bf16 was measured
    UNSALVAGEABLE: 82k wrong safe bits through the kappa~1e6 factor,
    an ambiguity band no budget covers — recorded negative result),
    restore full precision on every decision-critical row in-program
    (_refine_Q), and certify the safe set in host f64 through the
    usual narrow band.

    Round 4 (VERDICT r3 #3): TWO configurations are measured and gated
    separately —

    * STRICT (the shipped default, refine_k=2048): the selection head
      (one combined top-k over width / best-l0 / maximizer-boundary
      proximity scores, safe rows only) is also restored
      to full precision, so golden-trajectory identity must hold
      EXACTLY: ``cap512_trajectory_match`` gates next_idx equality and
      bitwise S/M/G equality against the full-precision run, no tie
      tolerances.  BOTH runs first go through the production
      certification protocol (float64 oracle on the triaged band rows
      + correction pass on a flip, mirroring
      ``SafeOpt._certified_step``): the user-visible trajectory is the
      CERTIFIED one, and pass-1 knife-edge rows inside the f64 band
      legitimately differ because ``_refine_Q`` recomputes them on a
      different (exact-posterior) code path than the chunked grid
      pass — the oracle settles every such row identically.
    * FAST (refine_k=0, opt-in): only the safety band is restored;
      ``cap512_safe_set_certified`` gates that every raw S flip sits
      inside the f64 certification band (the oracle settles those rows
      identically for both runs) with no overflow — the honest,
      narrower claim. Its selection drift is REPORTED (width-tie gap)
      but no longer excused into a parity verdict.

    ``cap512_certified_device_ms`` is the strict config's pure device
    time (reps chained inside one program, CLAUDE.md protocol) — the
    end-to-end numbers include a ~4-5 ms remote-tunnel dispatch that
    vanishes on directly attached TPUs; the per-stage decomposition
    lives in benchmarks/bench_cap512_stages.py and docs/design.md.
    """
    import jax
    import jax.numpy as jnp

    from safeopt_tpu.algorithms.safe_opt_core import certified_scan

    gp_f, gp_g = _cap512_gps()
    kernels = (gp_f.kern, gp_g.kern)
    states = (gp_f.state, gp_g.state)
    dtype = states[0].X.dtype
    fmin = jnp.asarray([0.2, 0.5], dtype)
    beta = jnp.asarray(2.0, dtype)
    scaling = jnp.asarray([np.sqrt(2.0), 1.0], dtype)
    threshold = jnp.asarray([0.0, 0.0], dtype)
    use_pallas = jax.default_backend() != "cpu"

    # the strict-mode refine budget: keep ONE local so the overflow
    # check below can never drift from the refine_k actually passed to
    # run() (ADVICE r4 #3 — the literal already went stale once)
    strict_rk = 2048

    def run(prec, rk, rbk, b=beta):
        return certified_scan(
            kernels, states, grid_dev, fmin, b, scaling, threshold,
            jnp.asarray(boundary_band, dtype),
            refine_band=jnp.asarray(refine_band, dtype), k=k,
            refine_k=rk, refine_band_k=rbk, chunk=32,
            use_pallas=use_pallas, interval_precision=prec)

    el_strict, (res_s, packed_s) = _time_step(
        lambda: run(precision, strict_rk, refine_band_k), reps=10)
    el_fast, (res_f, packed_f) = _time_step(
        lambda: run(precision, 0, refine_band_k), reps=10)
    el_ref, (res_r, packed_r) = _time_step(
        lambda: run(None, 0, 0), reps=10)

    # pure device time of the strict config: chain reps inside one
    # program with a carry-perturbed beta, difference reps 1 vs 6
    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("reps",))
    def dev_prog(b0, *, reps):
        def body(i, carry):
            b, acc = carry
            res, packed = run(precision, strict_rk, refine_band_k, b=b)
            acc = acc + jnp.max(res.Q) + jnp.sum(packed).astype(dtype)
            return b + (acc % 2).astype(dtype) * 1e-9, acc
        return jax.lax.fori_loop(0, reps, body,
                                 (b0, jnp.zeros((), dtype)))[1]

    def dev_t(reps):
        float(dev_prog(beta, reps=reps))
        best = np.inf
        # best-of-3: a single tunnel hiccup (hundreds of ms) otherwise
        # lands straight in the difference (measured: one-sample runs
        # reported 107 ms for a 24 ms step)
        for j in range(1, 4):
            t0 = time.perf_counter()
            float(dev_prog(beta * (1 + (reps + j) * 1e-9), reps=reps))
            best = min(best, time.perf_counter() - t0)
        return best

    device_ms = (dev_t(6) - dev_t(1)) / 5 * 1e3

    pf = np.asarray(packed_f)
    ps = np.asarray(packed_s)
    pr = np.asarray(packed_r)
    # the refine budget is shared across every boundary's band
    # (safety + the rk trajectory-identity head) — _refine_Q's uniform
    # overflow contract
    overflow_f = bool(pf[5] > k) or bool(pf[6] > refine_band_k)
    overflow_s = (bool(ps[5] > k)
                  or bool(ps[6] > refine_band_k + strict_rk))

    # ---- apply the PRODUCTION protocol to every run: float64 oracle
    # on the triaged band rows, correction pass only on a flip
    # (mirrors SafeOpt._certified_step, safe_opt.py:361-455).  The
    # certified outputs are what a user's trajectory is made of; the
    # pass-1 rows differ legitimately at knife-edge band rows because
    # _refine_Q recomputes them on a different (exact-posterior) code
    # path than the chunked grid pass.
    from safeopt_tpu.algorithms.safe_opt_core import safeopt_step_from_Q

    grid_np = np.asarray(grid_dev)
    fmin_np = np.asarray([0.2, 0.5])
    beta_np = 2.0

    def certify(res, packed):
        p = np.asarray(packed)
        idx = p[7:7 + k]
        within = p[7 + k:7 + 2 * k].astype(bool)
        s32 = p[7 + 2 * k:7 + 3 * k].astype(bool)
        sel = np.flatnonzero(within)
        flips = 0
        corr_ms = 0.0
        if sel.size:
            pts = grid_np[idx[sel]]
            safe64 = np.ones(sel.size, dtype=bool)
            for g, fm in ((gp_f, fmin_np[0]), (gp_g, fmin_np[1])):
                mu, var = g.predict_f64(pts)
                safe64 &= (mu - beta_np * np.sqrt(var)) > fm
            flips = int(np.count_nonzero(safe64 != s32[sel]))
            if flips:
                fix_idx = np.where(within, idx, -1).astype(np.int32)
                fix_bits = np.zeros(k, dtype=bool)
                fix_bits[sel] = safe64

                def corr():
                    return safeopt_step_from_Q(
                        kernels, states, grid_dev, res.Q,
                        jnp.asarray(fix_idx), jnp.asarray(fix_bits),
                        fmin, beta, scaling, threshold, chunk=32,
                        use_pallas=use_pallas)

                corr_s, res = _time_step(corr, reps=5)
                corr_ms = corr_s * 1e3
        S, M, G, ni = jax.device_get((res.S, res.M, res.G, res.next_idx))
        return S, M, G, int(ni), flips, corr_ms

    S_s, M_s, G_s, ni_s, flips_s, corr_s_ms = certify(res_s, ps)
    S_f, M_f, G_f, ni_f, flips_f, _ = certify(res_f, pf)
    S_r, M_r, G_r, ni_r, flips_r, corr_r_ms = certify(res_r, pr)

    # ---- STRICT gate: certified-trajectory identity, no tolerances ----
    trajectory_match = (ni_s == ni_r
                        and bool(np.array_equal(G_s, G_r))
                        and bool(np.array_equal(M_s, M_r))
                        and bool(np.array_equal(S_s, S_r)))

    Q_r = jax.device_get(res_r.Q)
    scal_np = np.asarray([np.sqrt(2.0), 1.0])
    l = Q_r[:, 0::2]
    u = Q_r[:, 1::2]
    margin = np.min(np.abs(l - fmin_np) / scal_np, axis=1)

    def s_gate(S_x, overflow):
        mism = S_x != S_r
        outside = int(np.count_nonzero(mism & (margin >= boundary_band)))
        return {
            "mismatches": int(np.count_nonzero(mism)),
            "outside_band": outside,
            "certified": outside == 0 and not overflow,
        }

    strict_s = s_gate(S_s, overflow_s)
    fast_s = s_gate(S_f, overflow_f)

    # ---- FAST mode: report (not excuse) the selection drift ----
    w = np.max((u - l) / scal_np, axis=1)
    w_ref = w[ni_r]
    fast_width_gap = abs(w[ni_f] - w_ref) / max(abs(w_ref), 1e-12)

    return {
        # strict (shipped default)
        "cap512_certified_ms": round(el_strict * 1e3, 3),
        "cap512_certified_device_ms": round(device_ms, 3),
        "cap512_certified_ref_ms": round(el_ref * 1e3, 3),
        "cap512_certified_speedup": round(el_ref / el_strict, 2),
        "cap512_certified_precision": precision,
        "cap512_certified_under_target": el_strict * 1e3 < TARGET_MS,
        "cap512_trajectory_match": trajectory_match,
        "cap512_next_idx_match": ni_s == ni_r,
        "cap512_M_mismatches": int(np.count_nonzero(M_s != M_r)),
        "cap512_G_mismatches": int(np.count_nonzero(G_s != G_r)),
        "cap512_certified_flips": flips_s,
        "cap512_ref_flips": flips_r,
        "cap512_correction_ms": round(corr_s_ms, 3),
        "cap512_safe_set_certified": strict_s["certified"],
        "cap512_S_mismatches": strict_s["mismatches"],
        "cap512_S_mismatches_outside_band": strict_s["outside_band"],
        "cap512_band_overflow": overflow_s,
        "cap512_f64_band_population": int(ps[5]),
        "cap512_refine_band_population": int(ps[6]),
        "cap512_certified_points_per_sec": round(
            grid_dev.shape[0] / el_strict),
        # 3-pass interval share of the strict step vs its bf16 floor
        "cap512_3pass_mxu_floor_ms": round(
            _mxu_floor_ms(512, grid_dev.shape[0], 2, 3), 2),
        # fast opt-in (refine_k=0): safe-set-only certification
        "cap512_fast_ms": round(el_fast * 1e3, 3),
        "cap512_fast_safe_set_certified": fast_s["certified"],
        "cap512_fast_S_mismatches_outside_band": fast_s["outside_band"],
        "cap512_fast_next_idx_match": ni_f == ni_r,
        "cap512_fast_next_width_gap": float(round(fast_width_gap, 9)),
    }


# ---------------------------------------------------------------------------
# VERDICT r4 item 1: the DEFAULT path at cap512 is the certified winner
# ---------------------------------------------------------------------------


def _cap512_default_secondary(grid):
    """A default-constructed SafeOpt at capacity 512 — no precision or
    certification kwargs — must resolve to the certified 3-pass path
    on TPU (the auto policy, safe_opt.AUTO_CERTIFIED_MIN_CAP) and be at
    least as fast as the plain 6-pass opt-out while reproducing its
    full-precision certified trajectory exactly. This measures what a
    USER gets, SafeOpt.optimize() end-to-end, not the certified_scan
    internals (_cap512_certified_secondary covers those)."""
    from safeopt_tpu import SafeOpt

    def windows(fn, reps=5, k=3):
        best = np.inf
        for _ in range(k):
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            best = min(best, (time.perf_counter() - t0) / reps * 1e3)
        return best

    def build():
        gp_f, gp_g = _cap512_gps()
        return [gp_f, gp_g]

    fmin = [0.2, 0.5]
    default = SafeOpt(build(), grid, fmin=fmin)            # the policy
    # the bitwise reference: full precision + HOST f64 oracle
    fullprec = SafeOpt(build(), grid, fmin=fmin,
                       exact_boundaries=True, interval_precision=None,
                       oracle="host")
    plain = SafeOpt(build(), grid, fmin=fmin,              # the opt-out
                    exact_boundaries=False, interval_precision=None)

    x_d = np.asarray(default.optimize())                   # compile
    x_f = np.asarray(fullprec.optimize())
    plain.optimize()
    traj_match = (bool(np.array_equal(x_d, x_f))
                  and bool(np.array_equal(default.S, fullprec.S))
                  and bool(np.array_equal(default.M, fullprec.M))
                  and bool(np.array_equal(default.G, fullprec.G)))

    ms_default = windows(default.optimize)
    ms_plain = windows(plain.optimize)
    return {
        "cap512_default_ms": round(ms_default, 3),
        "cap512_default_auto_enabled": bool(default._auto_certified),
        "cap512_default_precision": default._interval_precision,
        "cap512_default_oracle": default._oracle,
        # trajectory AND sets equal to the full-precision host-f64
        # reference — this also exercises the device-vs-host oracle
        # agreement on the production workload
        "cap512_default_trajectory_match": traj_match,
        "cap512_device_oracle_match": traj_match,
        "cap512_plain_optout_ms": round(ms_plain, 3),
        # the dominance gate: the default must not be slower than the
        # plain opt-out it replaced (small tolerance for tunnel noise)
        "cap512_default_dominates": bool(ms_default <= ms_plain * 1.05),
    }


# ---------------------------------------------------------------------------
# VERDICT r2 item 5: driver-captured serving evidence (jax.export)
# ---------------------------------------------------------------------------


def _deploy_secondary(kernels, states, grid_dev, fmin, beta, scaling,
                      threshold):
    """Export the flagship step ON this host, reload it, and serve:
    `deploy_step_ms` + exact decision parity vs the direct step makes
    the serving-path claim reproducible from the driver's artifacts
    (reference contract being productized: gp_opt.py:651 optimize())."""
    import jax

    from safeopt_tpu.algorithms.safe_opt_core import safeopt_step
    from safeopt_tpu.utils.deployment import export_step, load_step

    use_pallas = jax.default_backend() != "cpu"
    args = (kernels, states, grid_dev, fmin, beta, scaling, threshold)
    t0 = time.perf_counter()
    blob = export_step(*args, chunk=32, use_pallas=use_pallas)
    export_s = time.perf_counter() - t0
    served = load_step(blob)

    elapsed, out = _time_step(lambda: served(*args), reps=10)
    direct = safeopt_step(*args, chunk=32, use_pallas=use_pallas)
    a = jax.device_get((out.S, out.M, out.G, out.next_idx))
    b = jax.device_get((direct.S, direct.M, direct.G, direct.next_idx))
    parity = (bool(np.array_equal(a[0], b[0]))
              and bool(np.array_equal(a[1], b[1]))
              and bool(np.array_equal(a[2], b[2]))
              and int(a[3]) == int(b[3]))
    return {
        "deploy_step_ms": round(elapsed * 1e3, 3),
        "deploy_parity": parity,
        "deploy_export_s": round(export_s, 1),
        "deploy_blob_kb": round(len(blob) / 1024, 1),
        "deploy_mosaic": use_pallas,
    }


# ---------------------------------------------------------------------------
# VERDICT r2 item 7: sparse (DTC) long-campaign benchmark
# ---------------------------------------------------------------------------


def _sparse_secondary(grid_dev, n=2000, m=64):
    """The scale-with-n story measured: n=2,000 observations through a
    m=64 DTC model vs the exact GP — 1e6-grid step time, per-point
    model-update time (incremental rank-1 vs bordered-Cholesky), and
    the decision drift the approximation costs.

    Round 4 (VERDICT r3 #4): the drift is swept over m in {64, 128,
    256} with the direction split (optimistic = DTC-safe where the
    exact GP says unsafe — the dangerous direction), and the
    RECOMMENDED long-campaign setting ``SparseGPRegression(m=64,
    conservative=1.0)`` (calibrated constant variance floor, see
    gp/sparse.py) is measured for both drift and step time — the gate
    is ``sparse_recommended_drift_optimistic == 0`` with the step
    speedup ≥ 10x."""
    import jax
    import jax.numpy as jnp

    from safeopt_tpu.algorithms.safe_opt_core import safeopt_step
    from safeopt_tpu.gp import GPRegression, RBF
    from safeopt_tpu.gp.sparse import SparseGPRegression

    rng = np.random.default_rng(11)
    X = rng.uniform(-4.0, 4.0, size=(n, 2))
    Y = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1))
         + 0.05 * rng.normal(size=n))[:, None]
    kern = RBF(2, variance=2.0, lengthscale=1.0)

    t0 = time.perf_counter()
    sparse = SparseGPRegression(X, Y, kern, noise_var=0.05 ** 2,
                                inducing=m)
    sparse_build_s = time.perf_counter() - t0
    exact = GPRegression(X, Y, kern, noise_var=0.05 ** 2, capacity=2048)

    dtype = grid_dev.dtype
    fmin = jnp.asarray([0.2], dtype)
    beta = jnp.asarray(2.0, dtype)
    scaling = jnp.asarray([np.sqrt(2.0)], dtype)
    threshold = jnp.asarray([0.0], dtype)
    use_pallas = jax.default_backend() != "cpu"

    el_s, r_s = _time_step(lambda: safeopt_step(
        (kern,), (sparse.state,), grid_dev, fmin, beta, scaling,
        threshold, chunk=32, use_pallas=use_pallas), reps=10)
    # exact at capacity 2048 exceeds the Pallas VMEM working set; the
    # XLA path is the honest comparator for the dense model
    el_e, r_e = _time_step(lambda: safeopt_step(
        (kern,), (exact.state,), grid_dev, fmin, beta, scaling,
        threshold, chunk=32, use_pallas=False), reps=3)

    S_s, S_e, Q_e = jax.device_get((r_s.S, r_e.S, r_e.Q))

    # Drift characterization: is the S disagreement a boundary-band
    # phenomenon? Scaled exact-model safety margin per grid point;
    # drifted rows should sit near zero relative to the grid's spread.
    l_e = Q_e[:, 0::2]
    margin_e = np.min((l_e - np.asarray(jax.device_get(fmin)))
                      / np.asarray(jax.device_get(scaling)), axis=1)
    drift = S_s != S_e
    drift_margins = np.abs(margin_e[drift]) if drift.any() else np.array([0.0])
    spread = float(np.percentile(np.abs(margin_e), 95))

    # ---- full (m x c x calibration) floor sweep (VERDICT r4 #5) ----
    # The round-4 sweep only varied m at c=0 plus one floored point
    # (m=64, c=1, max-statistic), whose floor — calibrated to an
    # outlier statistic — forfeited 47% of the exact safe set. Run the
    # complete product and let the data pick the recommendation:
    # optimistic drift == 0 AND >= 10x speedup first, then minimal
    # conservative drift. Step time depends on (m, floored-or-not)
    # only, so each is timed once and shared across c/statistic.
    S_e_np = np.asarray(S_e)
    sweep = {}
    candidates = []
    step_ms_by = {}
    for m_i in (64, 128, 256):
        for c_i, cal in ((0.0, "max"), (0.5, "max"), (1.0, "max"),
                         (0.5, 0.99), (0.75, 0.99), (0.85, 0.99),
                         (1.0, 0.99)):
            sp_i = SparseGPRegression(X, Y, kern, noise_var=0.05 ** 2,
                                      inducing=m_i, conservative=c_i,
                                      calibration=cal)
            tkey = (m_i, c_i > 0)     # kernel structure: plain vs +White
            if tkey not in step_ms_by:
                el_i, _ = _time_step(lambda sp=sp_i: safeopt_step(
                    (sp.kern,), (sp.state,), grid_dev, fmin, beta,
                    scaling, threshold, chunk=32,
                    use_pallas=use_pallas), reps=5)
                step_ms_by[tkey] = el_i * 1e3
            r_i = safeopt_step((sp_i.kern,), (sp_i.state,), grid_dev,
                               fmin, beta, scaling, threshold, chunk=32,
                               use_pallas=use_pallas)
            S_i = np.asarray(jax.device_get(r_i.S))
            opt_i = int(np.count_nonzero(S_i & ~S_e_np))
            con_i = int(np.count_nonzero(~S_i & S_e_np))
            key = (f"m{m_i}_c{c_i:g}" + ("" if cal == "max"
                                         else f"_p{int(cal * 100)}"))
            entry = {
                "optimistic": opt_i, "conservative": con_i,
                "floor": round(float(sp_i._floor), 6),
                "step_ms": round(step_ms_by[tkey], 3),
                "speedup": round(el_e * 1e3 / step_ms_by[tkey], 1),
            }
            sweep[key] = entry
            candidates.append((key, m_i, c_i, cal, entry))

    eligible = [c for c in candidates
                if c[4]["optimistic"] == 0 and c[4]["speedup"] >= 10.0]
    # min conservative drift; deterministic tie-break toward smaller m
    # (cheaper refits) then smaller c
    eligible.sort(key=lambda c: (c[4]["conservative"], c[1], c[2]))
    rec_key, rec_m, rec_c, rec_cal, rec_entry = (
        eligible[0] if eligible else candidates[0])
    rec = SparseGPRegression(X, Y, kern, noise_var=0.05 ** 2,
                             inducing=rec_m, conservative=rec_c,
                             calibration=rec_cal)
    el_rec, r_rec = _time_step(lambda: safeopt_step(
        (rec.kern,), (rec.state,), grid_dev, fmin, beta, scaling,
        threshold, chunk=32, use_pallas=use_pallas), reps=10)
    S_rec = np.asarray(jax.device_get(r_rec.S))
    rec_opt = int(np.count_nonzero(S_rec & ~S_e_np))
    rec_con = int(np.count_nonzero(~S_rec & S_e_np))

    # per-point model update: incremental rank-1 vs bordered Cholesky
    xq = np.array([0.7, -0.3])
    t0 = time.perf_counter()
    for i in range(8):
        sparse.append_data(xq + 1e-3 * i, 1.0)
    sparse_append_ms = (time.perf_counter() - t0) / 8 * 1e3
    t0 = time.perf_counter()
    for i in range(8):
        exact.append_data(xq + 1e-3 * i, 1.0)
    exact_append_ms = (time.perf_counter() - t0) / 8 * 1e3

    return {
        "sparse_m_sweep": sweep,
        "sparse_recommended": (f"m={rec_m}, conservative={rec_c:g}, "
                               f"calibration={rec_cal}"),
        "sparse_recommended_step_ms": round(el_rec * 1e3, 3),
        "sparse_recommended_speedup": round(el_e / el_rec, 1),
        "sparse_recommended_floor": round(float(rec._floor), 6),
        "sparse_recommended_drift_optimistic": rec_opt,
        "sparse_recommended_drift_conservative": rec_con,
        "sparse_recommended_gate": (rec_opt == 0
                                    and el_e / el_rec >= 10.0),
        # VERDICT r4 #5 target: the full sweep should surface a config
        # forfeiting <= ~10k exact-safe rows (informational)
        "sparse_recommended_conservative_under_10k": rec_con <= 10000,
        "sparse_n": n, "sparse_m": m,
        "sparse_step_ms": round(el_s * 1e3, 3),
        "sparse_exact_step_ms": round(el_e * 1e3, 3),
        "sparse_step_speedup": round(el_e / el_s, 1),
        "sparse_append_ms": round(sparse_append_ms, 3),
        "sparse_exact_append_ms": round(exact_append_ms, 3),
        "sparse_build_s": round(sparse_build_s, 2),
        "sparse_decision_drift": int(np.count_nonzero(S_s != S_e)),
        "sparse_drift_optimistic": int(np.count_nonzero(S_s & ~S_e)),
        "sparse_drift_conservative": int(np.count_nonzero(~S_s & S_e)),
        "sparse_drift_max_margin": round(float(drift_margins.max()), 4),
        "sparse_drift_margin_p95": round(
            float(np.percentile(drift_margins, 95)), 4),
        "sparse_grid_margin_p95": round(spread, 4),
        "sparse_safe_count": int(S_s.sum()),
    }


# ---------------------------------------------------------------------------
# round-2 addition: contextual product kernel through the fused path
# ---------------------------------------------------------------------------


def _context_config(num_gps, cap, n_obs):
    from safeopt_tpu.gp import GPRegression, RBF

    rng = np.random.default_rng(3)
    kerns, states = [], []
    for g in range(num_gps):
        kern = (RBF(1, variance=2.0, lengthscale=1.0, active_dims=[0])
                * RBF(1, variance=1.0, lengthscale=1.5, active_dims=[1],
                      name="context"))
        X = np.hstack([rng.uniform(-3.0, 3.0, size=(n_obs, 1)),
                       np.zeros((n_obs, 1))])      # context column = 0
        Y = (2.0 - 0.5 * g) * np.exp(-0.5 * X[:, :1] ** 2)
        gp = GPRegression(X, Y, kern, noise_var=0.05 ** 2, capacity=cap)
        kerns.append(kern)
        states.append(gp.state)
    return tuple(kerns), tuple(states)


def _context_measure(grid_dev, num_gps, cap, n_obs):
    import jax
    import jax.numpy as jnp

    from safeopt_tpu.algorithms.safe_opt_core import safeopt_step

    kernels, states = _context_config(num_gps, cap, n_obs)
    dtype = states[0].X.dtype
    fmin_np = [0.2] + [0.3] * (num_gps - 1)
    scal_np = [np.sqrt(2.0)] + [1.0] * (num_gps - 1)
    args = (kernels, states, grid_dev, jnp.asarray(fmin_np, dtype),
            jnp.asarray(2.0, dtype), jnp.asarray(scal_np, dtype),
            jnp.asarray([0.0] * num_gps, dtype))

    el_p, r_p = _time_step(
        lambda: safeopt_step(*args, chunk=32, use_pallas=True), reps=10)
    el_x, r_x = _time_step(
        lambda: safeopt_step(*args, chunk=32, use_pallas=False), reps=10)
    assert bool(r_p.has_safe)

    a = jax.device_get((r_p.S, r_p.M, r_p.G, r_p.next_idx, r_p.Q))
    b = jax.device_get((r_x.S, r_x.M, r_x.G, r_x.next_idx, r_x.Q))
    mism = {k: int(np.count_nonzero(x != y))
            for k, x, y in zip("SMG", a[:3], b[:3])}
    # Band-aware decision-parity GATE (ADVICE r2 #3), same logic as
    # _pallas_parity_gate: both paths carry ~1e-4 f32 noise, so only a
    # flip whose true margin exceeds the band is material — a real
    # Mosaic bug (wrong tile / bf16 accumulation) still trips it.
    band = 1e-3
    l_xla = b[4][:, 0::2]
    margin = np.min(np.abs(l_xla - np.asarray(fmin_np))
                    / np.asarray(scal_np), axis=1)
    benign = margin < band
    material = {k: int(np.count_nonzero((x != y) & ~benign))
                for k, x, y in zip("SMG", a[:3], b[:3])}
    assert all(v == 0 for v in material.values()), \
        f"context kernel material decision mismatch: {material}"
    assert int(a[3]) == int(b[3]), "context kernel next_idx mismatch"
    return el_p, el_x, mism, material


def _context_kernel_secondary(grid_dev):
    """1e6-grid step with the reference's contextual product kernel
    (RBF(param) x RBF(context), context_example notebook) through the
    fused Pallas sum-of-products path vs XLA — measured at the shipped
    1-GP/cap64 config AND at 2 GPs / capacity 256 (VERDICT r2 item 4),
    with a band-aware decision-parity gate (asserts, not just reports)
    on the hardware. The SafeOpt auto-enable heuristic follows these
    measurements (safe_opt.py)."""
    el_p, el_x, mism, material = _context_measure(grid_dev, 1, 64, 50)
    out = {
        "context_kernel_ms": round(el_p * 1e3, 3),
        "context_kernel_xla_ms": round(el_x * 1e3, 3),
        "context_pallas_speedup": round(el_x / el_p, 2),
        "context_decision_mismatches": mism,
        "context_material_mismatches": material,
        "context_next_idx_match": True,     # asserted above
    }
    el_p2, el_x2, mism2, material2 = _context_measure(grid_dev, 2, 256,
                                                      250)
    out.update({
        "context_2gp_cap256_ms": round(el_p2 * 1e3, 3),
        "context_2gp_cap256_xla_ms": round(el_x2 * 1e3, 3),
        "context_2gp_pallas_speedup": round(el_x2 / el_p2, 2),
        "context_2gp_material_mismatches": material2,
        # SafeOpt's auto-enable follows these measurements: composite
        # kernels ride the fused path only when num_gps >= 2 or
        # capacity >= 128 (at 1 GP / cap64 both paths sit on the
        # ~4 ms latency floor and XLA occasionally edges it out)
        "context_auto_policy": "products fused iff num_gps>=2 or cap>=128",
    })
    return out


# ---------------------------------------------------------------------------
# VERDICT item 4b: expander-stress (many chunks through the while_loop)
# ---------------------------------------------------------------------------

def _expander_stress_secondary():
    """A config where NO candidate can pass the expander test, forcing
    the chunked while_loop to walk every candidate — the reference's
    worst case (gp_opt.py:557-612: each candidate triggers a GP refit
    + posterior and none breaks the loop).

    Construction: every grid point is safe (the objective is
    unconstrained; the single constraint GP has one observation and
    ``fmin = -3`` — three prior standard deviations below the prior
    mean — so its lower bound clears the threshold everywhere). The
    unsafe set is therefore EMPTY and the expander predicate is
    vacuously false for every candidate, while the barely-observed
    constraint GP's wide intervals qualify nearly every non-maximizer
    as a candidate. 128x128 grid, chunk 256 -> ~60 chunks walked."""
    import jax
    import jax.numpy as jnp

    from safeopt_tpu import linearly_spaced_combinations
    from safeopt_tpu.algorithms.safe_opt_core import safeopt_step
    from safeopt_tpu.gp import GPRegression, RBF

    rng = np.random.default_rng(1)
    n_obs = 50
    X = rng.uniform(-4.0, 4.0, size=(n_obs, 2))
    Yf = (2.0 * np.exp(-0.1 * np.sum(X ** 2, axis=1))
          + 0.02 * rng.normal(size=n_obs))[:, None]
    gp_f = GPRegression(X, Yf, RBF(2, variance=2.0, lengthscale=1.0),
                        noise_var=0.05 ** 2, capacity=64)
    gp_g = GPRegression(X[:1], np.array([[0.0]]),
                        RBF(2, variance=1.0, lengthscale=1.0),
                        noise_var=0.05 ** 2, capacity=64)
    grid = linearly_spaced_combinations([(-5.0, 5.0), (-5.0, 5.0)], 128)
    dtype = gp_f.state.X.dtype
    grid_dev = jnp.asarray(grid, dtype)
    chunk = 256
    scaling = np.array([np.sqrt(2.0), 1.0])
    fmin = np.array([-np.inf, -3.0])
    use_pallas = jax.default_backend() != "cpu"

    def step():
        return safeopt_step((gp_f.kern, gp_g.kern),
                            (gp_f.state, gp_g.state), grid_dev,
                            jnp.asarray(fmin, dtype),
                            jnp.asarray(2.0, dtype),
                            jnp.asarray(scaling, dtype),
                            jnp.asarray([0.0, 0.0], dtype),
                            chunk=chunk, use_pallas=use_pallas)

    # The remote tunnel's dispatch jitter is bimodal (~4-5 ms nominal
    # with occasional multi-ms hiccups); the best window tracks the
    # step, the mean includes the tunnel's tail. Five windows so the
    # mean is estimated, not sampled.
    runs = [_time_step(step, reps=5) for _ in range(5)]
    elapsed, result = min(runs, key=lambda r: r[0])
    mean_ms = float(np.mean([r[0] for r in runs])) * 1e3
    S, M, G, Q = jax.device_get((result.S, result.M, result.G, result.Q))
    assert S.all(), "stress config must be safe everywhere"
    # reconstruct the candidate count host-side (mirrors _classify)
    l, u = Q[:, 0::2], Q[:, 1::2]
    width = u - l
    max_var = (np.max(width[M, 0]) / scaling[0] if M.any() else np.inf)
    cand = S & ~M & (np.max(width / scaling, axis=1) > max_var)
    n_chunks = int(np.ceil(cand.sum() / chunk))
    return {
        "expander_stress_ms": round(elapsed * 1e3, 3),
        "expander_stress_mean_ms": round(mean_ms, 3),
        "expander_stress_chunks": n_chunks,
        "expander_stress_candidates": int(cand.sum()),
        "expander_stress_found": bool(G.any()),
        # gate on the MEAN (VERDICT r3 #8): best-of hid tunnel spread
        "expander_stress_under_target": bool(mean_ms < TARGET_MS),
        "expander_stress_best_under_target": bool(elapsed * 1e3
                                                  < TARGET_MS),
    }


# ---------------------------------------------------------------------------
# on-device BO loop (scan) secondary
# ---------------------------------------------------------------------------

def _fused_loop_secondary(kernels, states, grid_dev, fmin, beta, scaling,
                          threshold):
    """Complete BO iterations (step + observe + model update) under one
    lax.scan dispatch — the zero-host-round-trip serving path."""
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
    ms = round((time.perf_counter() - t0) / 3 / n_iter * 1e3, 2)
    return {"fused_loop_ms_per_iter": ms}


# ---------------------------------------------------------------------------
# VERDICT item 3: swarm iteration, attributed (compute vs host+tunnel)
# ---------------------------------------------------------------------------

def _swarm_config(num_gps):
    import jax

    from safeopt_tpu import SafeOptSwarm
    from safeopt_tpu.gp import GPRegression, Matern32, RBF

    rng = np.random.default_rng(0)
    d, n0 = 10, 5
    X = rng.uniform(-0.5, 0.5, size=(n0, d))
    Yf = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1)))[:, None]
    gps = [GPRegression(X, Yf, RBF(d, variance=2.0, lengthscale=2.0),
                        noise_var=0.01)]
    fmin = [0.0]
    if num_gps == 2:
        Yg = (1.0 - 0.05 * np.sum(X ** 2, axis=1))[:, None]
        gps.append(GPRegression(X, Yg,
                                Matern32(d, variance=1.0, lengthscale=3.0),
                                noise_var=0.01))
        fmin = [-np.inf, 0.0]
    gp_arg = gps if num_gps == 2 else gps[0]
    return SafeOptSwarm(gp_arg, fmin=fmin, bounds=[(-3.0, 3.0)] * d,
                        swarm_size=20, key=jax.random.key(0))


def _swarm_attributed(opt):
    """(total_ms, compute_ms): end-to-end optimize() vs back-to-back
    re-dispatch of the compiled fused program on fixed operands.

    total includes host orchestration + the single device->host pull
    (~40-45 ms through the remote tunnel, swarm_opt.py:299-307);
    compute is the device program itself (dispatches pipeline, so the
    amortized per-call time is the true execution time)."""
    import jax

    from safeopt_tpu.algorithms.swarm_opt_fused import fused_swarm_optimize

    opt.optimize()                         # compile + state warm
    # best of three short windows: each optimize() pays one mandatory
    # device->host pull whose tunnel latency is bimodal (see the
    # expander-stress note) — the best window tracks the iteration.
    windows = []
    for _ in range(3):
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            opt.optimize()
        windows.append((time.perf_counter() - t0) / reps * 1e3)
    total_ms = min(windows)

    args, kwargs = opt._fused_args()
    out = fused_swarm_optimize(*args, **kwargs)
    jax.block_until_ready(out)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fused_swarm_optimize(*args, **kwargs)
    jax.block_until_ready(out)
    compute_ms = (time.perf_counter() - t0) / reps * 1e3
    return total_ms, compute_ms


def _swarm_secondary():
    """10-d swarm iteration, 1-GP and 2-GP, attributed. Target
    (VERDICT item 3): < 50 ms total including the tunnel pull."""
    out = {}
    opt1 = _swarm_config(num_gps=1)
    total, compute = _swarm_attributed(opt1)
    out["swarm_10d_total_ms"] = round(total, 1)
    out["swarm_10d_compute_ms"] = round(compute, 2)
    out["swarm_10d_host_tunnel_ms"] = round(total - compute, 1)
    out["swarm_target_met"] = total < 50.0

    opt2 = _swarm_config(num_gps=2)
    total2, compute2 = _swarm_attributed(opt2)
    out["swarm_10d_2gp_total_ms"] = round(total2, 1)
    out["swarm_10d_2gp_compute_ms"] = round(compute2, 2)

    out["swarm_loop_ms_per_iter"] = _swarm_loop_ms()
    out.update(_swarm_pipeline())
    return out


def _swarm_pipeline(n_iter=24):
    """VERDICT r4 #6: the lag-1 campaign loop pipelined over the
    tunnel. ``run_lagged_campaign`` overlaps iteration t's result pull
    (and the plant's evaluation) with iteration t+1's device compute
    by chaining dispatches on in-flight device state — per-iteration
    wall time should approach max(pull, compute) instead of their sum,
    with the query sequence BITWISE equal to the blocking loop (the
    two run the same lag-1 algorithm; see algorithms/pipeline.py).

    Timing protocol: each mode runs a throwaway warmup campaign
    (compiles; trajectories are deterministic so capacities repeat),
    then a fresh timed campaign.
    """
    from safeopt_tpu.algorithms.pipeline import run_lagged_campaign

    def plant(x):
        return float(2.0 * np.exp(-0.5 * np.sum(np.asarray(x) ** 2)))

    def run(pipelined):
        opt = _swarm_config(num_gps=1)
        t0 = time.perf_counter()
        xs, _ = run_lagged_campaign(opt, plant, n_iter,
                                    pipelined=pipelined)
        ms = (time.perf_counter() - t0) / n_iter * 1e3
        return xs, ms

    run(False)                             # compile warmup (serial)
    xs_s, serial_ms = run(False)
    run(True)                              # compile warmup (pipelined)
    xs_p, pipe_ms = run(True)

    match = bool(np.array_equal(xs_s, xs_p))
    return {
        "swarm_10d_lagged_serial_ms": round(serial_ms, 2),
        "swarm_10d_pipelined_ms": round(pipe_ms, 2),
        "swarm_pipeline_speedup": round(serial_ms / max(pipe_ms, 1e-9), 2),
        "swarm_pipeline_traj_match": match,
        # the overlap claim: pipelined per-iter is at most ~max(pull,
        # compute) + slack, i.e. it must shed most of the serialized
        # compute+host time rather than just noise
        "swarm_pipeline_overlap_gate": match and pipe_ms < serial_ms,
    }


def _swarm_loop_ms():
    """Complete swarm BO iterations (3 swarms + observe + model update)
    under one lax.scan dispatch — the swarm serving path."""
    import jax
    import jax.numpy as jnp

    from safeopt_tpu.algorithms.runner import run_swarmopt_loop
    from safeopt_tpu.algorithms.swarm_opt_fused import SwarmIterState
    from safeopt_tpu.gp import GPRegression, RBF

    rng = np.random.default_rng(0)
    d, n0, n_iter = 10, 5, 10
    X = rng.uniform(-0.5, 0.5, size=(n0, d))
    Y = (2.0 * np.exp(-0.5 * np.sum(X ** 2, axis=1)))[:, None]
    gp = GPRegression(X, Y, RBF(d, variance=2.0, lengthscale=2.0),
                      noise_var=0.01, capacity=64)
    dtype = gp.state.X.dtype

    def f(x):
        return 2.0 * jnp.exp(-0.5 * jnp.sum(x * x))

    cap = 512
    S_buf = np.zeros((cap, d))
    S_buf[:n0] = X
    iter_state = SwarmIterState(S=jnp.asarray(S_buf, dtype),
                                count=jnp.asarray(n0, jnp.int32),
                                greedy=jnp.asarray(X[0], dtype))
    vel = jnp.asarray(np.full(d, 0.25), dtype)
    bounds = jnp.asarray([[-3.0, 3.0]] * d, dtype)

    def call(key):
        return run_swarmopt_loop(
            (gp.kern,), (gp.state,), iter_state, key, vel, bounds,
            jnp.asarray([0.0], dtype), jnp.asarray([np.sqrt(2.0)], dtype),
            jnp.asarray([0.0], dtype), np.full(n_iter, 2.0), X[0], -np.inf,
            objectives=(f,), n_iter=n_iter, swarm_size=20, max_iters=100,
            noise_std=0.01)

    r = call(jax.random.key(0))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(3):
        r = call(jax.random.key(i + 1))
    jax.block_until_ready(r)
    return round((time.perf_counter() - t0) / 3 / n_iter * 1e3, 2)




# ---------------------------------------------------------------------------
# round-2 addition: campaign-fleet throughput (parallel/campaigns.py)
# ---------------------------------------------------------------------------


def _fleet_secondary(K=8, n_iter=8):
    """K independent on-device SafeOpt campaigns vmapped into one
    program on this chip: ms per (campaign x iteration), i.e. the
    amortized cost of one full BO iteration when serving fleets. On a
    multi-chip mesh the campaign axis shards (tests/test_campaigns.py);
    here it demonstrates single-chip fleet batching throughput."""
    import jax
    import jax.numpy as jnp

    from safeopt_tpu import linearly_spaced_combinations
    from safeopt_tpu.gp import GPRegression, RBF
    from safeopt_tpu.parallel import (run_safeopt_campaigns,
                                      stack_campaign_states)

    kern = RBF(2, variance=2.0, lengthscale=1.2)

    def objective(x):
        return 2.0 * jnp.exp(-0.5 * jnp.sum(x * x))

    rng = np.random.default_rng(5)
    per_campaign = []
    for _ in range(K):
        x0 = rng.uniform(-0.4, 0.4, size=(1, 2))
        y0 = 2.0 * np.exp(-0.5 * np.sum(x0 ** 2))
        gp = GPRegression(x0, np.array([[y0]]), kern, noise_var=1e-4,
                          capacity=16)
        per_campaign.append((gp.state,))
    batched = stack_campaign_states(per_campaign)

    grid = jnp.asarray(np.asarray(linearly_spaced_combinations(
        [(-2.0, 2.0), (-2.0, 2.0)], 100)), jnp.float32)
    dtype = grid.dtype

    def fleet(seed):
        return run_safeopt_campaigns(
            (kern,), batched, grid, jnp.asarray([0.5], dtype),
            jnp.asarray(2.0, dtype), jnp.asarray([np.sqrt(2.0)], dtype),
            jnp.asarray([0.0], dtype),
            jax.random.split(jax.random.key(seed), K),
            objectives=(objective,), n_iter=n_iter, chunk=16)

    r = fleet(0)
    jax.block_until_ready(r.xs)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        r = fleet(i + 1)           # varying key: no dispatch elision
    ok = bool(np.asarray(r.has_safe).all())
    wall_ms = (time.perf_counter() - t0) / reps / (K * n_iter) * 1e3
    assert ok, "fleet lost certification"

    # VERDICT r4 #9: the headline fleet number varied +-80% across
    # rounds because a handful of ~17 ms dispatches sample the
    # tunnel's bimodal latency. Repeat INSIDE one program (keys
    # perturbed from the carry so the runtime cannot elide the
    # repeats, whole result consumed), difference reps 1 vs 9 — the
    # cap512_certified_device_ms protocol (CLAUDE.md).
    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("reps",))
    def fleet_reps(seed0, *, reps):
        def body(i, acc):
            keys = jax.random.split(
                jax.random.key(seed0 + i + (acc % 2.0).astype(jnp.int32)),
                K)
            rr = run_safeopt_campaigns(
                (kern,), batched, grid, jnp.asarray([0.5], dtype),
                jnp.asarray(2.0, dtype),
                jnp.asarray([np.sqrt(2.0)], dtype),
                jnp.asarray([0.0], dtype), keys,
                objectives=(objective,), n_iter=n_iter, chunk=16)
            return acc + jnp.max(rr.xs) * 1e-9
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    def t(reps):
        float(fleet_reps(1, reps=reps))        # compile + warm
        best = np.inf
        for j in range(1, 4):
            t0 = time.perf_counter()
            float(fleet_reps(1 + j, reps=reps))
            best = min(best, time.perf_counter() - t0)
        return best

    dev_ms = (t(9) - t(1)) / 8 / (K * n_iter) * 1e3

    return {
        "fleet_campaigns": K,
        "fleet_iters": n_iter,
        "fleet_ms_per_campaign_iter": round(dev_ms, 3),
        "fleet_wall_ms_per_campaign_iter": round(wall_ms, 3),
    }


# ---------------------------------------------------------------------------
# round-5 addition: the grid algorithm's lag-1 serving loop, pipelined
# ---------------------------------------------------------------------------


def _grid_pipeline_secondary(rng, grid, n_iter=16):
    """Exact-grid SafeOpt lag-1 campaign at cap512 (the DEFAULT
    auto-certified path), blocking vs pipelined. The grid step has no
    device-state chain (GP data enters on the host), so
    ``optimize_async`` dispatches overlap the tunnel pull, the plant,
    AND the per-iteration model update with the next iteration's
    device compute. Trajectory equality vs the blocking loop is
    gated. n_obs=480 leaves headroom so the campaign's adds never
    cross the capacity-512 boundary (no mid-campaign recompile)."""
    from safeopt_tpu.algorithms.pipeline import run_lagged_campaign

    def plant(x):
        x = np.asarray(x, dtype=float)
        return [2.0 * np.exp(-0.5 * np.sum(x ** 2)),
                1.0 - 0.1 * np.sum(x ** 2)]

    def build():
        from safeopt_tpu import SafeOpt
        gp_f, gp_g = _build_gps(np.random.default_rng(0), n_obs=480,
                                capacity=512, spread=4.0)
        return SafeOpt([gp_f, gp_g], np.asarray(grid),
                       fmin=[0.2, 0.5])

    def run(pipelined):
        opt = build()
        t0 = time.perf_counter()
        xs, _ = run_lagged_campaign(opt, plant, n_iter,
                                    pipelined=pipelined)
        return xs, (time.perf_counter() - t0) / n_iter * 1e3

    run(False)                              # compile warmup
    xs_s, serial_ms = run(False)
    run(True)
    xs_p, pipe_ms = run(True)
    match = bool(np.array_equal(xs_s, xs_p))
    return {
        "grid_lagged_serial_ms": round(serial_ms, 2),
        "grid_lagged_pipelined_ms": round(pipe_ms, 2),
        "grid_pipeline_speedup": round(serial_ms / max(pipe_ms, 1e-9), 2),
        "grid_pipeline_traj_match": match,
        "grid_pipeline_overlap_gate": match and pipe_ms < serial_ms,
    }


# ---------------------------------------------------------------------------
# VERDICT r4 #7: hyperparameter fitting, measured on hardware
# ---------------------------------------------------------------------------


def _hyperopt_secondary(n=512, restarts=8):
    """Time ``optimize_restarts`` (r=8, n=512, RBF-ARD) and sparse
    hyperopt with inducing moves, and justify the device routing with
    numbers: the 'auto' route runs the whole vmapped Adam scan + BFGS
    polish on the HOST CPU (float64, zero per-step accelerator round
    trips); the 'accel' route is measured alongside for the honest
    comparison (it also runs at the session dtype — f32 on TPUs — so
    both speed and fit quality are reported). gp/hyperopt.py 'Device
    routing' note holds the conclusion; the consumed-surface contract
    is GPy's ``optimize_restarts`` (reference gp_opt.py:329 doctest
    models are user-fit)."""
    from safeopt_tpu.gp import GPRegression, RBF
    from safeopt_tpu.gp.hyperopt import fit_hyperparameters
    from safeopt_tpu.gp.sparse import SparseGPRegression

    rng = np.random.default_rng(7)
    X = rng.uniform(-3.0, 3.0, size=(n, 2))
    Y = (1.5 * np.exp(-0.5 * np.sum((X / [1.0, 1.8]) ** 2, axis=1))
         + 0.05 * rng.normal(size=n))[:, None]

    def fresh_kern():
        return RBF(2, variance=0.6, lengthscale=[0.4, 0.4], ARD=True)

    gp = GPRegression(X, Y, fresh_kern(), noise_var=0.02)
    t0 = time.perf_counter()
    lml = gp.optimize_restarts(num_restarts=restarts, max_iters=200)
    auto_s = time.perf_counter() - t0

    # The honest accelerator comparison is a SINGLE run: the vmapped
    # (restarts+1)-way batch CRASHES the TPU worker (libtpu kernel
    # fault on the batched (512,512) cholesky scan — scoped round 5:
    # n=512/steps=200 single-run ok at 64 s, the same fit with
    # restarts=8 kills the worker and every subsequent dispatch).
    # Projection: single-run time x (restarts + 1).
    t0 = time.perf_counter()
    _, _, lml_accel = fit_hyperparameters(
        fresh_kern(), X, Y, 0.02, steps=200, restarts=0,
        device="accel", polish=False)
    accel_s = (time.perf_counter() - t0) * (restarts + 1)

    # sparse fit incl. inducing moves (GPy sparse optimize semantics)
    Xs = rng.uniform(-3.0, 3.0, size=(2000, 2))
    Ys = (1.5 * np.exp(-0.5 * np.sum((Xs / [1.0, 1.8]) ** 2, axis=1))
          + 0.05 * rng.normal(size=2000))[:, None]
    sp = SparseGPRegression(Xs, Ys, fresh_kern(), noise_var=0.02,
                            inducing=64)
    t0 = time.perf_counter()
    lml_sp = sp.optimize_restarts(num_restarts=2, max_iters=100,
                                  optimize_inducing=True)
    sparse_s = time.perf_counter() - t0

    return {
        "hyperopt_restarts_ms": round(auto_s * 1e3, 1),
        "hyperopt_restarts_lml": round(float(lml), 3),
        "hyperopt_accel_projected_ms": round(accel_s * 1e3, 1),
        "hyperopt_accel_single_lml": (None if not np.isfinite(lml_accel)
                                      else round(float(lml_accel), 3)),
        "hyperopt_route": "host-cpu f64 (auto)",
        "hyperopt_accel_note": ("restarts>0 vmapped batch crashes the "
                                "TPU worker (libtpu fault, round 5); "
                                "projection = single-run x (r+1)"),
        "hyperopt_auto_beats_accel": bool(auto_s <= accel_s),
        "hyperopt_sparse_inducing_ms": round(sparse_s * 1e3, 1),
        "hyperopt_sparse_lml": round(float(lml_sp), 3),
        "hyperopt_n": n, "hyperopt_restarts": restarts,
        "hyperopt_lml_finite": bool(np.isfinite(lml)
                                    and np.isfinite(lml_sp)),
    }


# ---------------------------------------------------------------------------
# VERDICT r4 missing #3: one FULL-LENGTH notebook run on hardware
# ---------------------------------------------------------------------------


def _notebook_fulllength_secondary(name="1d_example.ipynb"):
    """Execute the reference's flagship notebook at its SHIPPED length
    (range(20) driver loop, /root/reference/examples/1d_example.ipynb
    cell 6) on the real device — closing the gap between "the
    notebooks execute" (CI runs them shrunk to 3 iterations,
    tests/test_notebooks.py) and "the notebooks reproduce". Records
    wall time and that the driver loop completed and reported a
    maximum."""
    import contextlib
    import io
    import json as _json
    import os

    import matplotlib
    matplotlib.use("Agg")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "examples", name)
    with open(path) as f:
        nb = _json.load(f)
    cells = []
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        src = "\n".join(ln for ln in src.splitlines()
                        if not ln.lstrip().startswith(("%", "!")))
        cells.append(src.replace("plt.show()", "plt.close('all')"))

    ns = {"__name__": "nb_full"}
    buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        for i, src in enumerate(cells):
            exec(compile(src, f"{name}[cell {i}]", "exec"), ns)
    wall_s = time.perf_counter() - t0
    out = buf.getvalue()
    return {
        "notebook_fulllength": name,
        "notebook_fulllength_s": round(wall_s, 2),
        "notebook_fulllength_ok": "best" in out,
        "notebook_fulllength_cells": len(cells),
    }


if __name__ == "__main__":
    main()
