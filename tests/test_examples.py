"""Smoke-run every example script end to end (the user-facing surface).

Each example executes in-process (runpy with patched argv) on the CPU
test mesh with tiny iteration counts — the assertions INSIDE the
examples (safety invariants, improvement, certification) are the test
oracles. The campaign-fleet and pendulum --fleet runs exercise the
8-virtual-device mesh from conftest.
"""

import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def _run(script, *argv):
    old = sys.argv
    sys.argv = [script] + list(argv)
    try:
        runpy.run_path(os.path.join(EXAMPLES, script), run_name="__main__")
    except SystemExit as e:  # some examples end with sys.exit(0)
        assert not e.code, f"{script} exited with {e.code}"
    finally:
        sys.argv = old


@pytest.mark.parametrize("script,argv", [
    ("example_1d.py", ("--algo", "grid", "--iters", "4")),
    ("example_1d.py", ("--algo", "swarm", "--iters", "3")),
    ("example_2d.py", ("--iters", "3")),
    ("example_multiple_constraints.py", ("--iters", "4")),
    ("example_context.py", ("--iters", "2")),
    ("example_on_device_loop.py", ("--iters", "4")),
    ("example_pendulum_tuning.py", ("--iters", "8")),
    ("example_pendulum_tuning.py", ("--iters", "3", "--fleet", "8")),
    ("example_campaign_fleet.py", ("--iters", "3")),
    ("example_long_campaign.py", ("--n-pre", "60", "--iters", "6",
                                  "--inducing", "9")),
    ("example_quasi_periodic.py", ("--iters", "8", "--refit-every", "4")),
    ("example_pipelined_campaign.py", ("--iters", "5", "--dim", "3")),
], ids=["1d-grid", "1d-swarm", "2d", "multi-constraint", "context",
        "on-device-loop", "pendulum", "pendulum-fleet", "campaign-fleet",
        "long-campaign", "quasi-periodic", "pipelined-campaign"])
def test_example_runs(script, argv, capsys):
    _run(script, *argv)
    out = capsys.readouterr().out
    assert ("best" in out) or ("fleet" in out)
