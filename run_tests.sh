#!/bin/bash
# Test gate, mirroring the reference's test_code.sh (lint + docstyle +
# pytest with doctests + coverage floor). flake8/pydocstyle are not in
# this image, so the lint stage is a strict byte-compile pass plus a
# native AST linter (tools/lint_gate.py: E501 line length, F401 unused
# imports, D1xx missing public docstrings); pytest-cov is not in the
# image either, so the 50% coverage floor (reference
# test_code.sh:38-41) is enforced by a native PEP 669 sys.monitoring
# gate (tools/coverage_gate.py).
set -e

echo "=== compile check ==="
python -m compileall -q safeopt_tpu/ tests/ examples/ tools/ bench.py \
    __graft_entry__.py

echo "=== lint + docstyle (native flake8/pydocstyle substitute) ==="
python tools/lint_gate.py

echo "=== unit + golden-parity tests (incl. docstring examples) ==="
echo "=== with 50% line-coverage floor over safeopt_tpu/ ==="
python tools/coverage_gate.py tests/ -q

echo "=== all gates passed ==="
