"""Global configuration for safeopt_tpu.

The library is dtype-polymorphic: on TPU the default compute dtype is
float32 (MXU-friendly), while golden/parity tests run on CPU with
``jax.config.update('jax_enable_x64', True)`` for float64 exactness.

Reference parity: befelix/SafeOpt runs GPy in float64 throughout; the
decisions that matter (safe-set membership, expander/maximizer argmax)
are interval comparisons, validated against an in-repo float64 NumPy
reference implementation in ``tests/reference_impl.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["default_dtype", "JITTER", "MATMUL_PRECISION",
           "with_matmul_precision"]

# Jitter added to prior covariance in sample_gp_function
# (reference: utilities.py:89 adds 1e-6 * I).
JITTER = 1e-6

# TPU f32 matmuls default to bf16 passes; safe-set membership is an
# interval comparison, so the posterior matmuls run at full f32
# precision ("highest" = 3-pass on the MXU — still a tiny fraction of
# the budget at these shapes). No effect on CPU.
MATMUL_PRECISION = "highest"


def default_dtype() -> jnp.dtype:
    """Return the default floating dtype (f64 when x64 is enabled)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def with_matmul_precision(fn):
    """Trace-time wrapper pinning matmul precision for a jitted body."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision(MATMUL_PRECISION):
            return fn(*args, **kwargs)

    return wrapped
