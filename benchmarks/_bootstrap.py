"""Shared sys.path bootstrap: make `safeopt_tpu` importable when a
benchmark script runs straight from a repo checkout (sys.path[0] is
benchmarks/, so `import _bootstrap` finds this file)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
