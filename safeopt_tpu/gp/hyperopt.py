"""GP hyperparameter learning by marginal-likelihood gradient ascent.

The reference consumes GPy models with *fixed* hyperparameters (its
notebooks never call GPy's ``optimize()``), but real users tune
kernels. This module provides that capability natively: the log
marginal likelihood is differentiable through the Cholesky, so
``jax.grad`` + optax Adam on log-transformed parameters handles any
kernel pytree (including ARD vectors and product compositions)
without per-kernel code.

Numerics: the objective factorizes the (tiny) n x n gram, so the whole
optimization runs on the host CPU backend **in float64**, forced via
``jax.enable_x64`` regardless of the session's x64 flag —
an f32 Cholesky of an ill-conditioned gram (repeated query points push
kappa to ~1e7) NaNs out and silently corrupts the fit (see
host_math.py and CLAUDE.md's invariant). Non-finite results are
rejected: the input hyperparameters are returned unchanged.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["log_marginal_likelihood", "fit_hyperparameters"]


def log_marginal_likelihood(kernel, X: jnp.ndarray, Y: jnp.ndarray,
                            noise_var) -> jnp.ndarray:
    """Exact GP log marginal likelihood log p(Y | X, theta).

    ``-0.5 y^T K^-1 y - sum(log diag L) - n/2 log(2 pi)`` with
    ``K = kern(X) + noise * I``.
    """
    n = X.shape[0]
    K = kernel.K(X) + noise_var * jnp.eye(n, dtype=X.dtype)
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), Y[:, 0])
    return (-0.5 * jnp.dot(Y[:, 0], alpha)
            - jnp.sum(jnp.log(jnp.diag(L)))
            - 0.5 * n * jnp.log(2.0 * jnp.pi))


def fit_hyperparameters(kernel, X, Y, noise_var: float, *,
                        steps: int = 200, learning_rate: float = 0.05,
                        optimize_noise: bool = True,
                        noise_floor: float = 1e-6
                        ) -> Tuple[object, float, float]:
    """Maximize the marginal likelihood over kernel params (+ noise).

    All kernel pytree leaves (variances, lengthscales — scalar or ARD,
    through product compositions) are optimized in log space with Adam.

    Returns ``(kernel, noise_var, final_lml)``. If the optimization
    produces a non-finite marginal likelihood or non-finite parameters
    (e.g. a degenerate gram collapsed the Cholesky), the input
    hyperparameters are returned unchanged together with their own LML.
    """
    import logging

    import optax

    # Float64 island (CLAUDE.md invariant): the whole optimization —
    # gram, Cholesky, Adam state — runs in f64 even when the session
    # default is f32 (TPU sessions leave jax_enable_x64 off).
    with jax.enable_x64(True):
        X = jnp.asarray(np.asarray(X, dtype=np.float64), jnp.float64)
        Y = jnp.asarray(np.asarray(Y, dtype=np.float64).reshape(-1, 1),
                        jnp.float64)

        leaves, treedef = jax.tree_util.tree_flatten(kernel)
        params = {
            "kern": [jnp.log(jnp.maximum(jnp.asarray(leaf, jnp.float64),
                                         1e-10)) for leaf in leaves],
            "noise": jnp.log(jnp.asarray(max(noise_var, noise_floor),
                                         jnp.float64)),
        }

        def unpack(p):
            kern = jax.tree_util.tree_unflatten(
                treedef, [jnp.exp(v) for v in p["kern"]])
            nv = (jnp.exp(p["noise"]) + noise_floor if optimize_noise
                  else jnp.asarray(noise_var, X.dtype))
            return kern, nv

        def loss(p):
            kern, nv = unpack(p)
            return -log_marginal_likelihood(kern, X, Y, nv)

        opt = optax.adam(learning_rate)

        @jax.jit
        def run(params):
            state = opt.init(params)

            def step(carry, _):
                params, state = carry
                val, grads = jax.value_and_grad(loss)(params)
                updates, state = opt.update(grads, state)
                params = optax.apply_updates(params, updates)
                return (params, state), val

            (params, _), vals = jax.lax.scan(step, (params, state), None,
                                             length=steps)
            return params, -loss(params)

        # Tiny problem; host CPU avoids per-step accelerator round trips.
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            with jax.default_device(cpu):
                params, lml = run(params)
        else:
            params, lml = run(params)

        params = jax.device_get(params)
        lml = float(lml)
        finite = np.isfinite(lml) and all(
            np.all(np.isfinite(np.asarray(v)))
            for v in jax.tree_util.tree_leaves(params))
        if not finite:
            logging.warning(
                "hyperparameter fit produced non-finite LML/params; "
                "keeping the input hyperparameters")
            lml0 = float(log_marginal_likelihood(
                kernel, X, Y, jnp.asarray(noise_var, jnp.float64)))
            return kernel, float(noise_var), lml0

        kern, nv = unpack(params)
        # Hand back host numpy leaves: the caller's device state casts
        # them to the session dtype; live f64 jnp leaves would clash
        # with an f32 session once the x64 context exits.
        kern = jax.tree_util.tree_map(lambda v: np.asarray(v), kern)
    return kern, float(nv), lml
