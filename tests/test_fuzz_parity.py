"""Randomized lockstep parity: random configurations vs the reference.

Each case draws a random problem — kernel family, hyperparameters,
number of GPs, thresholds, grid, seed data, RKHS test functions — and
runs several full BO iterations in lockstep with the sequential NumPy
float64 reference, requiring identical query points and identical
S/M/G sets at the end. This is the broadest evidence that the fused
device pipeline is decision-equivalent to the reference algorithm, not
just on the four curated configurations.

Degenerate forks are tolerated: when a configuration produces two
candidates whose selection values agree to ~1e-13 (e.g. symmetric
near-duplicate posteriors), float64 implementations with different op
orders may legitimately pick either; the harness verifies the fork IS
such a near-tie (both implementations value both choices identically
to 1e-9) and ends the case there. Anything else fails.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from safeopt_tpu import SafeOpt, linearly_spaced_combinations
from safeopt_tpu.gp import (Bias, Cosine, Exponential, GPRegression,
                            Linear, Matern32, Matern52, MLP, Poly,
                            RatQuad, RBF)

from reference_impl import (RefBias, RefCosine, RefExponential, RefGP,
                            RefLinear, RefMatern32, RefMatern52, RefMLP,
                            RefPoly, RefRatQuad, RefRBF, RefSafeOpt)


def _random_case(rng):
    d = int(rng.integers(1, 3))          # 1-2 input dims
    num_gps = int(rng.integers(1, 4))    # 1-3 GPs
    grid_n = int(rng.integers(80, 200))
    side = int(np.ceil(grid_n ** (1.0 / d)))
    bounds = [(-5.0, 5.0)] * d
    grid = linearly_spaced_combinations(bounds, side)

    kerns, rkerns, fns = [], [], []
    for g in range(num_gps):
        variance = float(rng.uniform(0.8, 3.0))
        if d == 1:
            ls = float(rng.uniform(0.6, 2.0))
        else:
            ls = rng.uniform(0.6, 2.0, size=d).tolist()
        ard = d > 1
        draw = rng.random()
        if draw < 0.35:
            kerns.append(RBF(d, variance=variance, lengthscale=ls, ARD=ard))
            rkerns.append(RefRBF(d, variance=variance, lengthscale=ls,
                                 ARD=ard))
        elif draw < 0.7:
            kerns.append(Matern32(d, variance=variance, lengthscale=ls,
                                  ARD=ard))
            rkerns.append(RefMatern32(d, variance=variance, lengthscale=ls,
                                      ARD=ard))
        elif draw < 0.75:
            kerns.append(Exponential(d, variance=variance, lengthscale=ls,
                                     ARD=ard))
            rkerns.append(RefExponential(d, variance=variance,
                                         lengthscale=ls, ARD=ard))
        elif draw < 0.80:
            power = float(rng.uniform(0.8, 3.0))
            kerns.append(RatQuad(d, variance=variance, lengthscale=ls,
                                 power=power, ARD=ard))
            rkerns.append(RefRatQuad(d, variance=variance, lengthscale=ls,
                                     power=power, ARD=ard))
        elif draw < 0.84:
            # round-2 sum algebra: stationary + constant offset
            bias_var = float(rng.uniform(0.1, 0.6))
            kerns.append(RBF(d, variance=variance, lengthscale=ls, ARD=ard)
                         + Bias(d, variance=bias_var))
            rkerns.append(RefRBF(d, variance=variance, lengthscale=ls,
                                 ARD=ard) + RefBias(d, variance=bias_var))
        elif draw < 0.88:
            # round-3: stationary + global linear trend (GPy Linear)
            lin_var = float(rng.uniform(0.02, 0.2))
            kerns.append(RBF(d, variance=variance, lengthscale=ls, ARD=ard)
                         + Linear(d, variances=lin_var))
            rkerns.append(RefRBF(d, variance=variance, lengthscale=ls,
                                 ARD=ard) + RefLinear(d, variances=lin_var))
        elif draw < 0.92:
            # round-3b: MLP (arcsine) network kernel
            wv = (rng.uniform(0.5, 2.0, size=d).tolist() if ard
                  else float(rng.uniform(0.5, 2.0)))
            bv = float(rng.uniform(0.2, 1.5))
            kerns.append(MLP(d, variance=variance, weight_variance=wv,
                             bias_variance=bv, ARD=ard))
            rkerns.append(RefMLP(d, variance=variance, weight_variance=wv,
                                 bias_variance=bv, ARD=ard))
        elif draw < 0.96:
            # round-3b: stationary + small cubic trend (GPy Poly)
            scale = float(rng.uniform(0.005, 0.02))
            pbias = float(rng.uniform(0.2, 1.0))
            kerns.append(RBF(d, variance=variance, lengthscale=ls, ARD=ard)
                         + Poly(d, variance=0.1, scale=scale, bias=pbias,
                                order=3.0))
            rkerns.append(RefRBF(d, variance=variance, lengthscale=ls,
                                 ARD=ard)
                          + RefPoly(d, variance=0.1, scale=scale,
                                    bias=pbias, order=3.0))
        elif d == 1:
            # round-3b: quasi-periodic Cosine * RBF (Cosine is a valid
            # covariance only in 1-D — cos(|x-z|) is not PD in d >= 2)
            cls = float(rng.uniform(0.8, 2.0))
            kerns.append(Cosine(1, variance=variance, lengthscale=cls)
                         * RBF(1, lengthscale=4.0))
            rkerns.append(RefCosine(1, variance=variance, lengthscale=cls)
                          * RefRBF(1, lengthscale=4.0))
        else:
            kerns.append(Matern52(d, variance=variance, lengthscale=ls,
                                  ARD=ard))
            rkerns.append(RefMatern52(d, variance=variance, lengthscale=ls,
                                      ARD=ard))
        centers = rng.uniform(-4, 4, size=(4, d))
        weights = rng.uniform(-1.0, 1.5, size=4)
        rk = rkerns[-1]

        def fn(x, rk=rk, centers=centers.copy(), weights=weights.copy(),
               bias=0.0):
            return rk.K(np.atleast_2d(x), centers) @ weights + bias

        fns.append(fn)

    # seed at an actual grid point so its tight posterior certifies it
    x0 = grid[[int(np.argmin(np.sum(grid ** 2, axis=1)))]]
    # shift each function so the seed is comfortably safe even for the
    # largest beta draws
    safe_level = 1.0 + 0.5 * 3.0 * np.sqrt(3.0)
    fns = [
        (lambda x, fn=fn, off=(safe_level - float(fn(x0)[0])): fn(x) + off)
        for fn in fns
    ]

    fmin = [0.0] * num_gps
    if num_gps > 1 and rng.random() < 0.5:
        fmin[0] = -np.inf                # unconstrained objective
    threshold = float(rng.uniform(0.0, 0.3))
    noise = float(10 ** rng.uniform(-5, -2.5))
    beta = float(rng.uniform(1.5, 3.0))
    return grid, kerns, rkerns, fns, fmin, threshold, noise, beta, x0


@pytest.mark.parametrize("seed", range(8))
def test_random_config_lockstep(seed):
    rng = np.random.default_rng(1000 + seed)
    (grid, kerns, rkerns, fns, fmin, threshold, noise, beta,
     x0) = _random_case(rng)

    y0 = np.array([[float(f(x0)[0]) for f in fns]])
    gps = [GPRegression(x0, y0[:, [i]], k, noise_var=noise)
           for i, k in enumerate(kerns)]
    rgps = [RefGP(x0, y0[:, [i]], k, noise_var=noise)
            for i, k in enumerate(rkerns)]
    gp_arg = gps if len(gps) > 1 else gps[0]
    rgp_arg = rgps if len(rgps) > 1 else rgps[0]

    opt = SafeOpt(gp_arg, grid, fmin=list(fmin), beta=beta,
                  threshold=threshold)
    ref = RefSafeOpt(rgp_arg, grid, fmin=list(fmin), beta=beta,
                     threshold=threshold)

    forked = False
    for it in range(5):
        x = np.asarray(opt.optimize())
        xr = np.asarray(ref.optimize())
        if not np.allclose(x, xr, atol=1e-9):
            # legitimate only if the two choices are a float near-tie
            # of the selection criterion in the REFERENCE's arithmetic
            l = ref.Q[:, ::2]
            u = ref.Q[:, 1::2]
            value = np.max((u - l) / ref.scaling, axis=1)
            io = int(np.argmin(np.sum((ref.inputs - x) ** 2, axis=1)))
            ir = int(np.argmin(np.sum((ref.inputs - xr) ** 2, axis=1)))
            tie_gap = abs(value[io] - value[ir])
            assert tie_gap < 1e-9 * max(abs(value[ir]), 1e-12), (
                f"seed {seed} truly diverged at iteration {it}: "
                f"{x} vs {xr}, selection gap {tie_gap:.3e}")
            forked = True
            break
        y = [float(f(x)[0]) for f in fns]
        opt.add_new_data_point(x, np.array([y]))
        ref.add_new_data_point(x, np.array([y]))

    if not forked:
        np.testing.assert_array_equal(opt.S, ref.S)
        np.testing.assert_array_equal(opt.M, ref.M)
        np.testing.assert_array_equal(opt.G, ref.G)
        m = opt.get_maximum()
        mr = ref.get_maximum()
        assert (m is None) == (mr is None)
        if m is not None:
            assert_allclose(np.asarray(m[0]), mr[0], atol=1e-9)


@pytest.mark.parametrize("seed", range(4))
def test_random_lipschitz_lockstep(seed):
    """Random configs through the Lipschitz expander variant."""
    rng = np.random.default_rng(2000 + seed)
    (grid, kerns, rkerns, fns, fmin, threshold, noise, beta,
     x0) = _random_case(rng)
    lip = float(rng.uniform(0.5, 3.0))

    y0 = np.array([[float(f(x0)[0]) for f in fns]])
    gps = [GPRegression(x0, y0[:, [i]], k, noise_var=noise)
           for i, k in enumerate(kerns)]
    rgps = [RefGP(x0, y0[:, [i]], k, noise_var=noise)
            for i, k in enumerate(rkerns)]
    gp_arg = gps if len(gps) > 1 else gps[0]
    rgp_arg = rgps if len(rgps) > 1 else rgps[0]

    opt = SafeOpt(gp_arg, grid, fmin=list(fmin), beta=beta,
                  threshold=threshold, lipschitz=lip)
    ref = RefSafeOpt(rgp_arg, grid, fmin=list(fmin), beta=beta,
                     threshold=threshold, lipschitz=lip)
    assert opt.use_lipschitz and ref.use_lipschitz

    for it in range(4):
        x = np.asarray(opt.optimize())
        xr = np.asarray(ref.optimize())
        if not np.allclose(x, xr, atol=1e-9):
            l = ref.Q[:, ::2]
            u = ref.Q[:, 1::2]
            value = np.max((u - l) / ref.scaling, axis=1)
            io = int(np.argmin(np.sum((ref.inputs - x) ** 2, axis=1)))
            ir = int(np.argmin(np.sum((ref.inputs - xr) ** 2, axis=1)))
            assert abs(value[io] - value[ir]) < 1e-9, \
                f"lipschitz seed {seed} diverged at iteration {it}"
            return
        y = [float(f(x)[0]) for f in fns]
        opt.add_new_data_point(x, np.array([y]))
        ref.add_new_data_point(x, np.array([y]))
    np.testing.assert_array_equal(opt.G, ref.G)


@pytest.mark.parametrize("seed", range(4))
def test_random_context_lockstep(seed):
    """Random contextual configs (product kernel, 1 context column)."""
    rng = np.random.default_rng(3000 + seed)
    var_p = float(rng.uniform(1.0, 3.0))
    ls_p = float(rng.uniform(0.7, 2.0))
    ls_c = float(rng.uniform(0.8, 2.5))
    kern = (RBF(1, variance=var_p, lengthscale=ls_p, active_dims=[0]) *
            RBF(1, variance=1.0, lengthscale=ls_c, active_dims=[1]))
    rkern = (RefRBF(1, variance=var_p, lengthscale=ls_p, active_dims=[0]) *
             RefRBF(1, variance=1.0, lengthscale=ls_c, active_dims=[1]))

    centers = np.column_stack([rng.uniform(-4, 4, size=4),
                               rng.uniform(-0.5, 0.5, size=4)])
    weights = rng.uniform(-1.0, 1.5, size=4)

    def raw(x):
        return rkern.K(np.atleast_2d(x), centers) @ weights

    x0 = np.array([[0.0, 0.0]])
    off = 1.0 + 0.5 * 3.0 * np.sqrt(var_p) - float(raw(x0)[0])

    def f(x):
        return raw(x) + off

    params = linearly_spaced_combinations([(-5.0, 5.0)],
                                          int(rng.integers(80, 150)))
    noise = float(10 ** rng.uniform(-5, -3))
    beta = float(rng.uniform(1.5, 3.0))
    gp = GPRegression(x0, f(x0)[:, None], kern, noise_var=noise)
    rgp = RefGP(x0, f(x0)[:, None], rkern, noise_var=noise)
    opt = SafeOpt(gp, params, fmin=[0.0], num_contexts=1, beta=beta,
                  threshold=0.1)
    ref = RefSafeOpt(rgp, params, fmin=[0.0], num_contexts=1, beta=beta,
                     threshold=0.1)

    contexts = [0.0, 0.0, float(rng.uniform(-0.3, 0.3)), 0.1]
    for it, ctx in enumerate(contexts):
        x = np.asarray(opt.optimize(context=np.array([ctx])))
        xr = np.asarray(ref.optimize(context=np.array([ctx])))
        assert_allclose(x, xr, atol=1e-9,
                        err_msg=f"context seed {seed} iteration {it}")
        joint = np.concatenate([x, [ctx]])
        y = float(f(joint[None, :])[0])
        opt.add_new_data_point(x, y, context=np.array([ctx]))
        ref.add_new_data_point(x, y, context=np.array([ctx]))


def run_swarm_lockstep_case(seed, iters=6):
    """One random SafeOptSwarm lockstep case (shared with the offline
    sweep, fuzz_sweep.py): stepwise AND fused paths must reproduce
    the independent NumPy orchestration mirror under shared uniform
    streams (round-2 harness, tests/test_swarm_lockstep.py)."""
    from reference_impl import RefSafeOptSwarm
    from test_swarm_lockstep import (FusedStreamedSwarm, StreamedSwarm,
                                     make_provider)

    rng = np.random.default_rng(seed)
    d = int(rng.integers(1, 7))
    num_gps = int(rng.integers(1, 3))
    swarm_size = int(rng.integers(8, 14))
    max_iters = int(rng.integers(10, 16))
    threshold = float(rng.uniform(0.0, 0.2))
    noise = float(10 ** rng.uniform(-5, -3))
    bounds = [(-3.0, 3.0)] * d

    kerns, rkerns, fns = [], [], []
    for g in range(num_gps):
        variance = float(rng.uniform(0.8, 3.0))
        ls = float(rng.uniform(1.0, 3.0))
        cls, rcls = ((RBF, RefRBF) if rng.random() < 0.5
                     else (Matern32, RefMatern32))
        kerns.append(cls(d, variance=variance, lengthscale=ls))
        rkerns.append(rcls(d, variance=variance, lengthscale=ls))
        centers = rng.uniform(-2, 2, size=(3, d))
        weights = rng.uniform(-1.0, 1.5, size=3)
        rk = rkerns[-1]

        def fn(x, rk=rk, c=centers.copy(), w=weights.copy()):
            return rk.K(np.atleast_2d(x), c) @ w

        fns.append(fn)

    x0 = np.zeros((1, d))
    safe_level = 1.0 + 0.5 * 3.0 * np.sqrt(3.0)
    fns = [
        (lambda x, fn=fn, off=(safe_level - float(fn(x0)[0])): fn(x) + off)
        for fn in fns
    ]
    fmin = [0.0] * num_gps
    if num_gps > 1:
        fmin[0] = -np.inf
    y0 = np.array([[float(f(x0)[0]) for f in fns]])

    def make(kind, provider):
        if kind == "ref":
            rgps = [RefGP(x0, y0[:, [i]], k, noise_var=noise)
                    for i, k in enumerate(rkerns)]
            return RefSafeOptSwarm(
                rgps if num_gps > 1 else rgps[0], fmin=list(fmin),
                bounds=bounds, threshold=threshold, swarm_size=swarm_size,
                max_iters=max_iters, draw_uniform=provider)
        cls = StreamedSwarm if kind == "stepwise" else FusedStreamedSwarm
        gps = [GPRegression(x0, y0[:, [i]], k.copy(), noise_var=noise)
               for i, k in enumerate(kerns)]
        opt = cls(gps if num_gps > 1 else gps[0], fmin=list(fmin),
                  bounds=bounds, threshold=threshold,
                  swarm_size=swarm_size, max_iters=max_iters)
        opt.attach(provider)
        return opt

    ref = make("ref", make_provider(seed + 5000))
    step = make("stepwise", make_provider(seed + 5000))
    fused = make("fused", make_provider(seed + 5000))

    for it in range(iters):
        x_ref = np.asarray(ref.optimize())
        x_step = np.asarray(step.optimize(fused=False))
        x_fused = np.asarray(fused.optimize())
        assert_allclose(x_step, x_ref, atol=1e-6,
                        err_msg=f"swarm seed {seed} stepwise iter {it}")
        assert_allclose(x_fused, x_ref, atol=1e-6,
                        err_msg=f"swarm seed {seed} fused iter {it}")
        assert step.S.shape == ref.S.shape
        assert fused.S.shape == ref.S.shape
        for o, x in ((ref, x_ref), (step, x_step), (fused, x_fused)):
            y = np.array([[float(f(x)[0]) for f in fns]])
            o.add_new_data_point(np.atleast_2d(x), y)


@pytest.mark.parametrize("seed", range(4))
def test_random_swarm_lockstep(seed):
    run_swarm_lockstep_case(4000 + seed)
