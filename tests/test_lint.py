"""The native lint/docstyle gate stays clean (tools/lint_gate.py).

Mirrors the reference's CI ordering — flake8 + pydocstyle run before
the tests (test_code.sh:27-37) — by making lint cleanliness itself a
test, so a long-line or unused import fails the suite, not just
run_tests.sh.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_is_lint_clean():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lint_gate.py")],
        capture_output=True, text=True)
    assert out.returncode == 0, f"lint findings:\n{out.stdout}"


def test_lint_gate_detects_violations(tmp_path):
    """The gate actually fires on each rule class (it is a guard, not
    a rubber stamp)."""
    bad = tmp_path / "bad.py"
    bad.write_text('"""doc."""\nimport os\nx = "' + "y" * 90 + '"\n\n\n'
                   "def undocumented():\n    return 1\n")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lint_gate.py"),
         str(bad)], capture_output=True, text=True)
    assert out.returncode == 1
    assert "E501" in out.stdout
    assert "F401" in out.stdout
    assert "D103" in out.stdout
