#!/bin/bash
# Test gate, mirroring the reference's test_code.sh (lint + docstyle +
# pytest with doctests). flake8/pydocstyle are not in this image, so
# the lint stage is a strict byte-compile pass.
set -e

echo "=== compile check ==="
python -m compileall -q safeopt_tpu/ tests/ examples/ bench.py \
    __graft_entry__.py

echo "=== unit + golden-parity tests (incl. docstring examples) ==="
python -m pytest tests/ -q

echo "=== all gates passed ==="
