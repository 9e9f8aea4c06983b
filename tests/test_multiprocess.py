"""Cross-process multichip validation in CI (VERDICT r3 #5).

Spawns two real localhost processes (4 virtual CPU devices each) that
join one 8-device JAX distributed runtime and rerun the hierarchical
(dcn, data, model) mesh step plus a dcn-sharded campaign fleet with
actual cross-process (gloo) collectives — exercising host-major device
ordering and cross-process device_put paths that the single-process
virtual mesh (tests/test_sharding.py) structurally cannot. All
equality assertions (sharded==replicated decisions, sharded==solo
fleet trajectories) run INSIDE the workers; this test asserts their OK
lines and exit codes.
"""

import pytest


@pytest.mark.slow
def test_two_process_hier_mesh_and_fleet():
    from tools.mp_dryrun import run_two_process

    out = run_two_process()
    for pid in (0, 1):
        assert f"[p{pid}] hier mesh OK across 2 processes" in out
        assert f"[p{pid}] fleet OK across 2 processes" in out
