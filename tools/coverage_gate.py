#!/usr/bin/env python
"""Native line-coverage gate for the test suite (PEP 669).

The reference's CI enforces a 50% line-coverage floor via pytest-cov
(/root/reference/test_code.sh:38-41). pytest-cov / coverage.py are not
installable in this image, so this tool reimplements the essential
part on CPython 3.12's ``sys.monitoring``: a LINE-event callback
records the first execution of every (file, line) in ``safeopt_tpu/``
and then disables that location (``sys.monitoring.DISABLE``), so the
steady-state overhead is near zero — the same fast path coverage.py
uses on 3.12+.

Denominator = the union of line numbers reachable from each module's
compiled code objects (``co_lines`` walked recursively), i.e. real
executable lines, not raw file lines.

Usage: ``python tools/coverage_gate.py [pytest args...]``
Exits non-zero if pytest fails OR coverage < FLOOR_PCT.
"""

from __future__ import annotations

import os
import sys

FLOOR_PCT = 50.0   # mirror the reference's --cov-fail-under=50
TOOL_ID = 3        # sys.monitoring.PROFILER_ID is 2; pick a free slot

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "safeopt_tpu")

_executed: dict = {}


def _line_callback(code, line):
    fn = code.co_filename
    if fn.startswith(PKG):
        _executed.setdefault(fn, set()).add(line)
    # Disable THIS (code, line) location — first hit is all we need.
    return sys.monitoring.DISABLE


def _executable_lines(path: str) -> set:
    """All line numbers carrying bytecode in a source file."""
    with open(path, "r") as f:
        src = f.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines: set = set()
    stack = [top]
    code_t = type(top)
    while stack:
        c = stack.pop()
        for _start, _end, lineno in c.co_lines():
            if lineno is not None:
                lines.add(lineno)
        for const in c.co_consts:
            if isinstance(const, code_t):
                stack.append(const)
    # compile() assigns the module docstring/constants to line 0/None
    lines.discard(0)
    return lines


def main() -> int:
    mon = sys.monitoring
    mon.use_tool_id(TOOL_ID, "coverage_gate")
    mon.register_callback(TOOL_ID, mon.events.LINE, _line_callback)
    mon.set_events(TOOL_ID, mon.events.LINE)

    import pytest
    args = sys.argv[1:] or ["tests/", "-q"]
    rc = pytest.main(args)

    mon.set_events(TOOL_ID, 0)
    mon.free_tool_id(TOOL_ID)

    total = 0
    hit = 0
    per_file = []
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            lines = _executable_lines(path)
            got = _executed.get(path, set()) & lines
            total += len(lines)
            hit += len(got)
            pct = 100.0 * len(got) / len(lines) if lines else 100.0
            per_file.append((os.path.relpath(path, REPO), pct,
                             len(got), len(lines)))

    overall = 100.0 * hit / total if total else 0.0
    print("\n--- coverage (safeopt_tpu, sys.monitoring line events) ---")
    for rel, pct, got, n in per_file:
        print(f"  {rel:55s} {pct:5.1f}%  ({got}/{n})")
    print(f"TOTAL {overall:.1f}% ({hit}/{total} executable lines); "
          f"floor {FLOOR_PCT:.0f}%")

    if rc != 0:
        print("coverage_gate: pytest failed", file=sys.stderr)
        return int(rc)
    if overall < FLOOR_PCT:
        print(f"coverage_gate: coverage {overall:.1f}% is below the "
              f"{FLOOR_PCT:.0f}% floor", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
