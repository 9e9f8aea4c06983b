"""SwarmOptimization and SafeOptSwarm tests.

Component-level parity against the NumPy float64 reference (same
injected randomness), plus the reference's failure-mode test (empty
safe set raises RuntimeError, /root/reference/safeopt/tests/
test_swarm.py:13-22) and end-to-end invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from safeopt_tpu import SafeOptSwarm, SwarmOptimization
from safeopt_tpu.gp import GPRegression, Matern32, RBF
from safeopt_tpu.algorithms.swarm_opt import (_particle_fitness, _penalty,
                                              _run_swarm_fused)

from reference_impl import (RefGP, RefMatern32, RefRBF, ref_particle_fitness,
                            ref_penalty, ref_pso)

RNG = np.random.default_rng(42)


def _models():
    x0 = np.array([[0.0], [0.5], [-1.0]])
    y_f = np.array([[1.0], [0.8], [0.3]])
    y_g = np.array([[0.5], [0.6], [-0.2]])
    gp_f = GPRegression(x0, y_f, RBF(1, variance=2.0), noise_var=0.01)
    gp_g = GPRegression(x0, y_g, Matern32(1, variance=1.5), noise_var=0.01)
    rgp_f = RefGP(x0, y_f, RefRBF(1, variance=2.0), noise_var=0.01)
    rgp_g = RefGP(x0, y_g, RefMatern32(1, variance=1.5), noise_var=0.01)
    return (gp_f, gp_g), (rgp_f, rgp_g)


class TestPenalty:
    def test_matches_reference_across_all_bands(self):
        slack = np.array([0.5, 0.0, -0.0005, -0.001, -0.05, -0.1, -0.5,
                          -1.0, -2.0, -10.0])
        ours = np.asarray(_penalty(jnp.asarray(slack)))
        ref = ref_penalty(slack)
        assert_allclose(ours, ref, rtol=1e-12)


class TestParticleFitness:
    @pytest.mark.parametrize("swarm_type",
                             ["greedy", "maximizers", "expanders",
                              "safe_set"])
    def test_matches_reference(self, swarm_type):
        (gp_f, gp_g), (rgp_f, rgp_g) = _models()
        particles = RNG.uniform(-3, 3, size=(20, 1))
        beta, blb = 2.0, 0.4
        fmin = np.array([-np.inf, 0.0])
        scaling = np.array([np.sqrt(2.0), np.sqrt(1.5)])

        vals, safe = _particle_fitness(
            swarm_type, (gp_f.kern, gp_g.kern), (gp_f.state, gp_g.state),
            jnp.asarray(beta), jnp.asarray(fmin), jnp.asarray(scaling),
            jnp.asarray(blb), jnp.asarray(particles))
        rvals, rsafe = ref_particle_fitness(
            swarm_type, [rgp_f, rgp_g], beta, fmin, scaling, blb, particles)

        assert_allclose(np.asarray(vals), rvals, rtol=1e-8, atol=1e-10)
        np.testing.assert_array_equal(np.asarray(safe), rsafe)

    def test_constrained_objective(self):
        """fmin[0] finite: the objective GP itself is a constraint."""
        (gp_f, gp_g), (rgp_f, rgp_g) = _models()
        particles = RNG.uniform(-3, 3, size=(15, 1))
        fmin = np.array([0.0, 0.0])
        scaling = np.array([np.sqrt(2.0), np.sqrt(1.5)])
        vals, safe = _particle_fitness(
            "expanders", (gp_f.kern, gp_g.kern), (gp_f.state, gp_g.state),
            jnp.asarray(2.0), jnp.asarray(fmin), jnp.asarray(scaling),
            jnp.asarray(0.0), jnp.asarray(particles))
        rvals, rsafe = ref_particle_fitness(
            "expanders", [rgp_f, rgp_g], 2.0, fmin, scaling, 0.0, particles)
        assert_allclose(np.asarray(vals), rvals, rtol=1e-8, atol=1e-10)
        np.testing.assert_array_equal(np.asarray(safe), rsafe)


class TestSwarmScanParity:
    def test_pso_dynamics_match_reference(self):
        """Same fitness + same randomness => identical PSO trajectory."""
        (gp_f, gp_g), (rgp_f, rgp_g) = _models()
        fmin = np.array([-np.inf, 0.0])
        scaling = np.array([np.sqrt(2.0), np.sqrt(1.5)])
        beta = 2.0
        swarm_size, d, iters = 12, 1, 30

        positions = RNG.uniform(-2, 2, size=(swarm_size, d))
        velocities = RNG.uniform(0, 1, size=(swarm_size, d)) * 0.3
        r_stream = RNG.uniform(size=(iters, 2, swarm_size, d))
        vel_scale = np.array([0.3])
        bounds = np.array([[-3.0, 3.0]])

        res = _run_swarm_fused(
            (gp_f.kern, gp_g.kern), (gp_f.state, gp_g.state),
            jnp.asarray(positions), jnp.asarray(velocities),
            jnp.asarray(r_stream), jnp.asarray(vel_scale),
            jnp.asarray(bounds), jnp.asarray(beta), jnp.asarray(fmin),
            jnp.asarray(scaling), jnp.asarray(0.4),
            swarm_type="maximizers")

        def rfit(p):
            return ref_particle_fitness("maximizers", [rgp_f, rgp_g], beta,
                                        fmin, scaling, 0.4, p)

        _, _, rbp, rbv, rgb = ref_pso(rfit, positions, velocities, r_stream,
                                      vel_scale, bounds)
        assert_allclose(np.asarray(res.best_positions), rbp, rtol=1e-7,
                        atol=1e-9)
        assert_allclose(np.asarray(res.best_values), rbv, rtol=1e-7,
                        atol=1e-9)
        assert_allclose(np.asarray(res.global_best), rgb, rtol=1e-7,
                        atol=1e-9)


class TestSwarmOptimizationClass:
    def test_public_api_runs(self):
        def fitness(p):
            vals = -jnp.sum(p ** 2, axis=1)
            return vals, jnp.ones(p.shape[0], dtype=bool)

        swarm = SwarmOptimization(10, np.array([0.5, 0.5]), fitness,
                                  bounds=[(-2, 2), (-2, 2)])
        assert_allclose(swarm.max_velocity, [5.0, 5.0])
        positions = RNG.uniform(-2, 2, size=(10, 2))
        swarm.init_swarm(positions)
        swarm.run_swarm(50)
        # converges toward the optimum at the origin
        assert float(jnp.linalg.norm(swarm.global_best)) < 0.5


class TestSafeOptSwarm:
    def test_empty_safe_set(self):
        """Unsafe seed raises RuntimeError (reference test_swarm.py)."""
        gp = GPRegression(np.array([[0.0]]), np.array([[-1.0]]),
                          noise_var=0.01 ** 2)
        opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-1.0, 1.0]])
        with pytest.raises(RuntimeError):
            opt.optimize()

    def test_optimal_velocities_in_correlation_band(self):
        """Bisected velocities keep kernel correlation in (0.94, 0.95)."""
        gp = GPRegression(np.array([[0.0, 0.0]]), np.array([[1.0]]),
                          RBF(2, variance=2.0, lengthscale=[0.5, 2.0],
                              ARD=True), noise_var=0.01)
        opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-1, 1], [-1, 1]])
        v = opt.optimal_velocities * np.sqrt(2)  # undo 1/sqrt(d)
        for j in range(2):
            x = np.zeros((1, 2))
            x2 = np.zeros((1, 2))
            x2[0, j] = v[j]
            corr = float(np.asarray(gp.kern.K(x, x2))[0, 0]) / 2.0
            assert 0.94 - 1e-3 < corr < 0.95 + 1e-3

    def test_end_to_end_invariants(self):
        """Full loop: safe growth, queries within bounds, improvement."""
        rkern = RefRBF(1, variance=2.0)
        centers = [[-4.0], [-1.0], [0.0], [2.0], [5.0]]
        weights = [1.5, -1.0, 2.0, 1.0, -2.0]

        def f(x):
            return rkern.K(np.atleast_2d(x), centers) @ np.asarray(weights)

        x0 = np.array([[0.0]])
        gp = GPRegression(x0, f(x0)[:, None], RBF(1, variance=2.0),
                          noise_var=0.05 ** 2)
        opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-10.0, 10.0]],
                           threshold=0.2, key=jax.random.key(3))

        initial_safe = len(opt.S)
        for _ in range(10):
            x = opt.optimize()
            assert -10.0 <= float(x[0]) <= 10.0
            y = float(f(x[None, :] if x.ndim == 1 else x)[0])
            opt.add_new_data_point(x, y)
            # safety invariant: all sampled values stayed above fmin
            # modulo noise (the test function is deterministic here)
            assert y > -0.5

        assert len(opt.S) > initial_safe  # safe set grew
        xm, ym = opt.get_maximum()
        assert float(ym[0]) >= float(np.asarray(opt.gp.Y)[0, 0])

    def test_get_maximum_is_best_observed(self):
        gp = GPRegression(np.array([[0.0], [1.0], [2.0]]),
                          np.array([[1.0], [3.0], [2.0]]),
                          RBF(1, variance=2.0), noise_var=0.01)
        opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-5.0, 5.0]])
        x, y = opt.get_maximum()
        assert_allclose(x, [1.0])
        assert_allclose(y, [3.0])

    def test_ucb_mode(self):
        gp = GPRegression(np.array([[0.0]]), np.array([[1.0]]),
                          RBF(1, variance=2.0), noise_var=0.01)
        opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-3.0, 3.0]])
        x = opt.optimize(ucb=True)
        assert x.shape == (1,)


class TestFusedVsStepwise:
    def test_stepwise_path_still_works(self):
        """optimize(fused=False) exercises the reference-shaped host
        orchestration; both paths maintain the same invariants."""
        rkern = RefRBF(1, variance=2.0)

        def f(x):
            return rkern.K(np.atleast_2d(x), [[0.0], [2.0]]) @ np.array(
                [2.0, 1.0])

        x0 = np.array([[0.0]])
        gp = GPRegression(x0, f(x0)[:, None], RBF(1, variance=2.0),
                          noise_var=0.05 ** 2)
        opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-5.0, 5.0]],
                           key=jax.random.key(1))
        for _ in range(3):
            x = opt.optimize(fused=False)
            assert -5.0 <= float(x[0]) <= 5.0
            opt.add_new_data_point(x, float(f(x[None, :])[0]))

    def test_fused_empty_safe_set_keeps_state(self):
        """A failed fused iteration must not corrupt the safe set."""
        gp = GPRegression(np.array([[0.0]]), np.array([[-1.0]]),
                          noise_var=0.01 ** 2)
        opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-1.0, 1.0]])
        S_before = opt.S.copy()
        with pytest.raises(RuntimeError):
            opt.optimize()
        np.testing.assert_array_equal(opt.S, S_before)


def test_stepwise_ucb_mode():
    gp = GPRegression(np.array([[0.0]]), np.array([[1.0]]),
                      RBF(1, variance=2.0), noise_var=0.01)
    opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[[-3.0, 3.0]])
    x = opt.optimize(ucb=True, fused=False)
    assert x.shape == (1,)
    assert -3.0 <= float(x[0]) <= 3.0


class TestFusedComponentsMatchStepwise:
    """The fused iteration's traced state ops must reproduce the
    stepwise (reference-shaped) host logic on identical inputs."""

    def _model(self):
        X = np.array([[0.0], [0.5], [-0.8], [1.5]])
        Y = np.array([[1.2], [0.9], [-0.4], [0.7]])
        return GPRegression(X, Y, RBF(1, variance=2.0), noise_var=1e-3)

    def test_validate_and_prune_matches_host(self):
        import jax.numpy as jnp

        from safeopt_tpu.algorithms.swarm_opt_fused import \
            _validate_and_prune

        gp = self._model()
        # safe set with some points that the model now marks unsafe
        S = np.array([[0.0], [0.5], [-0.8], [1.5], [0.2], [-0.2]])
        cap = 8
        S_buf = np.zeros((cap, 1))
        S_buf[: len(S)] = S
        swarm_size = 2

        kernels, states = (gp.kern,), (gp.state,)
        beta = jnp.asarray(2.0)
        fmin = jnp.asarray([0.0])
        scaling = jnp.asarray([np.sqrt(2.0)])

        S_new, count_new, n_safe, pruned = _validate_and_prune(
            kernels, states, jnp.asarray(S_buf, float),
            jnp.asarray(len(S), jnp.int32), swarm_size, beta, fmin,
            scaling)

        # host reference: same fitness, same pruning rule
        from safeopt_tpu.algorithms.swarm_opt import _safe_set_check
        safe = np.asarray(_safe_set_check(
            kernels, states, jnp.asarray(S_buf, float),
            jnp.asarray(len(S), jnp.int32), beta, fmin, scaling))[:len(S)]
        num_safe = int(safe.sum())
        assert int(n_safe) == num_safe
        if num_safe >= swarm_size and num_safe != len(S):
            expected = S[safe]       # order-preserving compaction
            got = np.asarray(S_new)[: int(count_new)]
            assert_allclose(got, expected)
            assert int(pruned) == len(S) - num_safe

    def test_grow_safe_set_matches_host(self):
        import jax.numpy as jnp

        from safeopt_tpu.algorithms.swarm_opt_fused import _grow_safe_set

        gp = self._model()
        rng = np.random.default_rng(17)
        S = rng.uniform(-2, 2, size=(5, 1))
        best = np.vstack([S[0] + 1e-4,          # redundant (cov ~ 1)
                          rng.uniform(5, 9, size=(4, 1))])  # far => new
        cap = 16
        S_buf = np.zeros((cap, 1))
        S_buf[:5] = S

        S_new, count_new, added = _grow_safe_set(
            gp.kern, jnp.asarray(np.sqrt(2.0)), jnp.asarray(S_buf, float),
            jnp.asarray(5, jnp.int32), jnp.asarray(best, float))

        # host reference: the stepwise class logic on the same inputs
        from safeopt_tpu import SafeOptSwarm
        opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[(-10.0, 10.0)])
        opt.S = S.copy()
        opt._grow_safe_set(best)

        got = np.asarray(S_new)[: int(count_new)]
        assert_allclose(got, opt.S)
        assert int(added) == len(opt.S) - 5
