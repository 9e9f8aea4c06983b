"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the real TPU is reserved for
bench runs) with float64 enabled so results can be compared against the
in-repo NumPy float64 reference implementation (the stand-in for the
reference's GPy/float64 numerics).
"""

import os
import sys

# Make the suite runnable from any working directory.
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel), which must not leak into the test suite — TPU matmuls
# run at f32 precision regardless of x64 mode, and every compile goes
# through the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU fast-math approximates sqrt/exp inside fused kernels (~1e-8
# error even in f64), which breaks golden comparisons against the NumPy
# reference. Accuracy over speed for tests.
if "xla_cpu_enable_fast_math" not in flags:
    flags += " --xla_cpu_enable_fast_math=false"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The env var alone is not enough: pytest plugins (flax/chex entry
# points) import jax before this conftest runs, snapshotting
# JAX_PLATFORMS=axon into the config. Overriding the config value works
# as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles hundreds of XLA:CPU
# programs on one core, and the per-module clear_caches below (a
# segfault workaround) forces recompiles of shared signatures. Disk
# persistence makes every recompile — and every rerun of the suite — a
# cache hit (measured: full suite ~16 min cold, far less warm). Keyed
# by jaxlib version/flags, so upgrades invalidate cleanly.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SAFEOPT_TEST_CACHE",
                                 "/tmp/jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A single pytest process compiles many hundreds of distinct XLA:CPU
    programs across the suite; with everything retained in the jit
    caches, the process-lifetime accumulation has been observed to end
    in a segfault inside ``backend_compile_and_load`` on this jaxlib
    (0.9.0, 8 virtual devices) after ~150-200 tests — at a different,
    individually-green test every run. Clearing per module keeps the
    live-executable population bounded at the cost of recompiling the
    few cross-module shared signatures.
    """
    yield
    jax.clear_caches()
