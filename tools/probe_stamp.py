"""Hardware-probe stamp for the Pallas-adjacent surface.

The round-4 limb-hoist incident (docs/design.md, "A negative result")
proved CPU interpret mode is blind to Mosaic numerics: 381 CPU tests
stayed green while the hardware read back garbage through Mosaic ref
indexing. CLAUDE.md since *asks* for hardware probes after any change
under ``safeopt_tpu/ops/``, but nothing checked — this module makes
the discipline mechanical (VERDICT r4 next #4):

- ``surface_hash()`` — sha256 over the byte contents of every file in
  the probed surface: ``safeopt_tpu/ops/*.py``, the Pallas-adjacent
  core ``safeopt_tpu/algorithms/safe_opt_core.py``, and the precision
  policy ``safeopt_tpu/config.py``. Content-based, so commits without
  content changes never invalidate a stamp and uncommitted edits
  always do.
- ``record(probe, payload)`` — called ONLY by the two probe scripts
  (``benchmarks/probe_interval_precision.py``,
  ``benchmarks/run_cap512_only.py``) after a PASSING run on real TPU
  hardware; refuses to stamp from a CPU backend. Writes/merges
  ``PROBE_STAMP`` (JSON at the repo root, committed like TESTS_GREEN).
- ``check()`` — used by ``tools/snapshot_gate.sh``: the stamp must
  exist, its surface hash must equal the CURRENT surface hash, and
  both probes must have passed at that hash. Exit 1 with a
  which-probe-to-run message otherwise.
"""

from __future__ import annotations

import datetime
import glob
import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP = os.path.join(REPO, "PROBE_STAMP")
REQUIRED_PROBES = ("interval_precision", "cap512")

# Passing ceilings, in max scaled |dQ| units vs the XLA HIGHEST oracle
# (benchmarks/probe_interval_precision.py). Measured on hardware round
# 4: 6-pass paths ~1e-4, 3-pass ~7.3e-3; the broken limb hoist read
# 0.8 — two orders of magnitude above either ceiling.
CEILING_6PASS = 1e-3
CEILING_3PASS = 2e-2


def surface_files():
    files = sorted(glob.glob(os.path.join(REPO, "safeopt_tpu", "ops",
                                          "*.py")))
    files.append(os.path.join(REPO, "safeopt_tpu", "algorithms",
                              "safe_opt_core.py"))
    files.append(os.path.join(REPO, "safeopt_tpu", "config.py"))
    return files


def surface_hash() -> str:
    h = hashlib.sha256()
    for path in surface_files():
        h.update(os.path.relpath(path, REPO).encode())
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _load():
    if not os.path.exists(STAMP):
        return None
    with open(STAMP) as f:
        return json.load(f)


def record(probe: str, payload: dict) -> None:
    """Stamp a passing hardware probe for the current surface.

    Refuses on a CPU backend: the stamp is evidence about Mosaic
    lowering on real hardware, which interpret mode cannot provide.
    """
    import jax

    platform = jax.devices()[0].platform
    if platform == "cpu":
        print(f"probe_stamp: NOT stamping {probe!r} — backend is CPU "
              "(interpret mode is blind to Mosaic numerics)", flush=True)
        return
    try:
        commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                                capture_output=True,
                                text=True).stdout.strip()
    except Exception:
        commit = "no-git"
    cur = surface_hash()
    stamp = _load()
    if stamp is None or stamp.get("surface_sha") != cur:
        stamp = {"surface_sha": cur, "probes": {}}
    stamp["probes"][probe] = {
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "commit": commit,
        "device": str(jax.devices()[0]),
        "payload": payload,
    }
    with open(STAMP, "w") as f:
        json.dump(stamp, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"probe_stamp: stamped {probe!r} for surface "
          f"{cur[:12]}", flush=True)


def check() -> int:
    cur = surface_hash()
    stamp = _load()
    if stamp is None:
        print("probe_stamp: PROBE_STAMP missing — the Pallas surface "
              "has never been hardware-probed. Run on the TPU:\n"
              "  python benchmarks/probe_interval_precision.py\n"
              "  python benchmarks/run_cap512_only.py")
        return 1
    if stamp.get("surface_sha") != cur:
        print(f"probe_stamp: surface changed since the last stamp "
              f"({stamp.get('surface_sha', '?')[:12]} -> {cur[:12]}).\n"
              "A change under safeopt_tpu/ops/, safe_opt_core.py or "
              "config.py requires fresh hardware probes (CLAUDE.md; "
              "round-4 limb-hoist incident). Run on the TPU:\n"
              "  python benchmarks/probe_interval_precision.py\n"
              "  python benchmarks/run_cap512_only.py")
        return 1
    missing = [p for p in REQUIRED_PROBES if p not in stamp["probes"]]
    if missing:
        print(f"probe_stamp: surface hash matches but probes {missing} "
              "have not passed at this hash. Run the matching script(s) "
              "on the TPU.")
        return 1
    print(f"probe_stamp: ok (surface {cur[:12]}, probes "
          f"{sorted(stamp['probes'])})")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "hash":
        print(surface_hash())
    else:
        sys.exit(check())
