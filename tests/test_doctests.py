"""Execute the Examples blocks in the algorithm docstrings.

The reference's CI runs docstring examples as tests (test_code.sh runs
pytest --doctest-modules; the SafeOpt/SafeOptSwarm Examples blocks are
its only end-to-end algorithm tests — SURVEY.md section 4). Mirror
that here.
"""

import doctest

import safeopt_tpu.algorithms.safe_opt as safe_opt_mod
import safeopt_tpu.algorithms.swarm_opt as swarm_opt_mod


def _run(module):
    results = doctest.testmod(module, verbose=False,
                              optionflags=doctest.ELLIPSIS)
    assert results.failed == 0, f"{results.failed} doctest failures"
    assert results.attempted > 0, "no doctests collected"


def test_safeopt_docstring_example():
    _run(safe_opt_mod)


def test_safeoptswarm_docstring_example():
    _run(swarm_opt_mod)
