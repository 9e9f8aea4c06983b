"""Public API surface parity with the reference package.

The reference exports exactly the union of its modules' ``__all__``
lists via star imports (safeopt/__init__.py:38-39 re-exporting
gp_opt.py:27, swarm.py:14, utilities.py:17-18). A user switching from
``import safeopt`` to ``import safeopt_tpu`` must find every one of
those names, plus the GPy surface the reference tells users to bring
themselves (SURVEY.md section 2.8).
"""

import inspect

import safeopt_tpu


REFERENCE_EXPORTS = [
    # gp_opt.py:27
    "SafeOpt", "SafeOptSwarm",
    # swarm.py:14
    "SwarmOptimization",
    # utilities.py:17-18
    "linearly_spaced_combinations", "sample_gp_function",
    "plot_2d_gp", "plot_3d_gp", "plot_contour_gp",
]

# GPy names the reference's notebooks/tests use (SURVEY.md 2.8) that the
# rebuild internalizes instead of requiring an external dependency.
GPY_SURFACE = ["GPRegression", "RBF", "Matern32"]


def test_reference_exports_present():
    for name in REFERENCE_EXPORTS + GPY_SURFACE:
        assert hasattr(safeopt_tpu, name), f"missing export: {name}"
        assert name in safeopt_tpu.__all__, f"not in __all__: {name}"


def test_constructor_signatures_cover_reference_kwargs():
    """Reference constructor kwargs all exist with the same names
    (gp_opt.py:281-348, 715-781; swarm.py:17-64)."""
    sig = inspect.signature(safeopt_tpu.SafeOpt.__init__)
    for kw in ("gp", "parameter_set", "fmin", "lipschitz", "beta",
               "num_contexts", "threshold", "scaling"):
        assert kw in sig.parameters, f"SafeOpt missing kwarg {kw}"

    sig = inspect.signature(safeopt_tpu.SafeOptSwarm.__init__)
    for kw in ("gp", "fmin", "bounds", "beta", "scaling", "threshold",
               "swarm_size"):
        assert kw in sig.parameters, f"SafeOptSwarm missing kwarg {kw}"

    sig = inspect.signature(safeopt_tpu.SwarmOptimization.__init__)
    for kw in ("swarm_size", "velocity", "fitness", "bounds"):
        assert kw in sig.parameters, f"SwarmOptimization missing kwarg {kw}"


def test_gp_surface_methods():
    """The consumed GPy API surface, enumerated in SURVEY.md 2.8."""
    for attr in ("set_XY", "predict_noiseless", "_raw_predict",
                 "optimize"):
        assert hasattr(safeopt_tpu.GPRegression, attr), \
            f"GPRegression missing {attr}"

    import numpy as np
    gp = safeopt_tpu.GPRegression(np.zeros((1, 2)), np.zeros((1, 1)),
                                  safeopt_tpu.RBF(2), noise_var=0.1)
    assert gp.input_dim == 2
    assert gp.X.shape == (1, 2) and gp.Y.shape == (1, 1)
    assert gp.kern.input_dim == 2
    mu, var = gp.predict_noiseless(np.zeros((3, 2)))
    assert mu.shape == (3, 1) and var.shape == (3, 1)
    k = gp.kern.K(np.zeros((2, 2)))
    assert k.shape == (2, 2)
    assert gp.kern.Kdiag(np.zeros((2, 2))).shape == (2,)
    k2 = gp.kern.copy()
    assert k2 is not gp.kern


def test_kernel_algebra_closed_under_composition():
    import safeopt_tpu as st
    k = (st.RBF(1, active_dims=[0]) * st.Matern32(1, active_dims=[1])
         + st.Bias(2, variance=0.2))
    assert isinstance(k, st.Sum)
    assert k.input_dim == 2
    assert isinstance(k.copy(), st.Sum)
