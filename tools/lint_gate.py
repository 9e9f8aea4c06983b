#!/usr/bin/env python
"""Native lint + docstyle gate (the flake8/pydocstyle substitute).

The reference's CI runs flake8 and pydocstyle before the tests
(/root/reference/test_code.sh:27-37); neither is installable in this
image, so this tool reimplements the rules that carry the signal on
stdlib ``ast``:

- E501: source lines longer than 79 characters (flake8's default).
- F401: imports never referenced in the module (top-level and
  function-local).
- D1xx: missing docstrings on public modules, classes and MODULE-LEVEL
  functions (pydocstyle's missing-docstring family). Methods are
  exempt (pydocstyle's D102, the check real projects ignore first:
  property getters and protocol methods — tree_flatten, K, Kdiag —
  inherit their meaning from the class/base docstring), matching the
  reference's per-file-ignore spirit (test_code.sh:27-37).

Usage: ``python tools/lint_gate.py [paths...]`` (defaults to
``safeopt_tpu/``). Exits non-zero on any finding.
"""

from __future__ import annotations

import ast
import os
import sys

MAX_LINE = 79

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _module_files(paths):
    for path in paths:
        if os.path.isfile(path):
            yield path
            continue
        for root, _dirs, files in os.walk(path):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    yield os.path.join(root, f)


def _imported_names(node):
    """(alias, lineno) pairs bound by an import statement."""
    out = []
    if isinstance(node, ast.Import):
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            out.append((name, node.lineno))
    elif isinstance(node, ast.ImportFrom):
        if node.module == "__future__":
            return out           # compiler directives, never "used"
        for a in node.names:
            if a.name == "*":
                continue
            out.append((a.asname or a.name, node.lineno))
    return out


def _used_names(tree):
    used = set()
    for n in ast.walk(tree):
        if isinstance(n, ast.Name):
            used.add(n.id)
        elif isinstance(n, ast.Attribute):
            # the base of a dotted access is a Name; walk finds it
            pass
    return used


def check_file(path):
    findings = []
    rel = os.path.relpath(path, REPO)
    with open(path, "r") as fh:
        src = fh.read()

    for i, line in enumerate(src.splitlines(), start=1):
        # allow long URLs (flake8 noqa spirit, without inline noqa)
        if len(line) > MAX_LINE and "http" not in line:
            findings.append(f"{rel}:{i}: E501 line too long "
                            f"({len(line)} > {MAX_LINE})")

    tree = ast.parse(src, filename=path)
    used = _used_names(tree)

    # F401 at module level and inside functions: a bound import alias
    # that never appears as a Name anywhere in the module. __init__.py
    # re-export modules are exempt via __all__ membership.
    exported = set()
    for n in tree.body:
        if (isinstance(n, ast.Assign) and len(n.targets) == 1
                and isinstance(n.targets[0], ast.Name)
                and n.targets[0].id == "__all__"):
            try:
                exported = set(ast.literal_eval(n.value))
            except ValueError:
                pass
    for n in ast.walk(tree):
        for name, lineno in _imported_names(n) if isinstance(
                n, (ast.Import, ast.ImportFrom)) else ():
            if name not in used and name not in exported:
                findings.append(f"{rel}:{lineno}: F401 '{name}' imported "
                                "but unused")

    # D1xx: missing public docstrings
    if not ast.get_docstring(tree) and os.path.basename(path) != \
            "__init__.py":
        findings.append(f"{rel}:1: D100 missing module docstring")

    def want_doc(name):
        return not name.startswith("_") or name == "__init__"

    # Module-level definitions only: methods are exempt (D102 — see
    # module docstring) and closures are implementation detail.
    for n in tree.body:
        if not isinstance(n, (ast.ClassDef, ast.FunctionDef,
                              ast.AsyncFunctionDef)):
            continue
        if not want_doc(n.name):
            continue
        if not ast.get_docstring(n):
            kind = ("D101 missing class docstring"
                    if isinstance(n, ast.ClassDef)
                    else "D103 missing function docstring")
            findings.append(f"{rel}:{n.lineno}: {kind} ({n.name})")
    return findings


def main(argv):
    """CLI entry: lint the given paths (default safeopt_tpu/)."""
    paths = argv[1:] or [os.path.join(REPO, "safeopt_tpu")]
    all_findings = []
    n_files = 0
    for f in _module_files(paths):
        n_files += 1
        all_findings.extend(check_file(f))
    for line in all_findings:
        print(line)
    print(f"lint gate: {n_files} files, {len(all_findings)} finding(s)")
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
