"""Campaign-parallel BO fleets (parallel/campaigns.py).

Runs on the virtual 8-device CPU mesh from conftest: a batch of
independent campaigns vmapped into one program, with the campaign axis
sharded over the mesh. Each sharded campaign must reproduce its
individually-run counterpart.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safeopt_tpu import linearly_spaced_combinations
from safeopt_tpu.algorithms.runner import run_safeopt_loop, run_swarmopt_loop
from safeopt_tpu.gp import GPRegression, RBF
from safeopt_tpu.parallel import (make_mesh, run_safeopt_campaigns,
                                  run_swarmopt_campaigns,
                                  stack_campaign_states)

K = 8          # campaigns == virtual devices
N_ITER = 4


def _mk_gp(seed):
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(-0.3, 0.3, size=(1, 2))
    kern = RBF(2, variance=2.0, lengthscale=1.2)
    y0 = 2.0 * np.exp(-0.5 * np.sum(x0 ** 2))
    return GPRegression(x0, np.array([[y0]]), kern, noise_var=1e-4,
                        capacity=16)


def _objective(x):
    return 2.0 * jnp.exp(-0.5 * jnp.sum(x * x))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


class TestSafeOptCampaigns:
    def test_sharded_fleet_matches_individual_runs(self, mesh):
        gps = [_mk_gp(seed) for seed in range(K)]
        kern = gps[0].kern
        grid = np.asarray(linearly_spaced_combinations(
            [(-2.0, 2.0), (-2.0, 2.0)], 17))
        dtype = gps[0].state.X.dtype
        fmin = jnp.asarray([0.5], dtype)
        beta = jnp.asarray(2.0, dtype)
        scaling = jnp.asarray([np.sqrt(2.0)], dtype)
        threshold = jnp.asarray([0.0], dtype)
        keys = jax.random.split(jax.random.key(7), K)

        batched = stack_campaign_states([(g.state,) for g in gps])
        fleet = run_safeopt_campaigns(
            (kern,), batched, jnp.asarray(grid), fmin, beta,
            scaling, threshold, keys, objectives=(_objective,),
            n_iter=N_ITER, mesh=mesh, chunk=16)

        assert fleet.xs.shape == (K, N_ITER, 2)
        assert bool(fleet.has_safe.all())
        for k in (0, 3, 7):
            solo = run_safeopt_loop(
                (kern,), (gps[k].state,), jnp.asarray(grid), fmin, beta,
                scaling, threshold, keys[k], objectives=(_objective,),
                n_iter=N_ITER, chunk=16)
            np.testing.assert_array_equal(np.asarray(fleet.next_idx[k]),
                                          np.asarray(solo.next_idx))
            np.testing.assert_allclose(np.asarray(fleet.xs[k]),
                                       np.asarray(solo.xs), atol=1e-12)
            np.testing.assert_allclose(np.asarray(fleet.ys[k]),
                                       np.asarray(solo.ys), rtol=1e-10)

    def test_unsharded_batch_runs_too(self):
        """mesh=None: plain vmap on one device."""
        gps = [_mk_gp(seed) for seed in (0, 1)]
        kern = gps[0].kern
        grid = np.asarray(linearly_spaced_combinations(
            [(-2.0, 2.0), (-2.0, 2.0)], 9))
        dtype = gps[0].state.X.dtype
        batched = stack_campaign_states([(g.state,) for g in gps])
        fleet = run_safeopt_campaigns(
            (kern,), batched, jnp.asarray(grid), jnp.asarray([0.5], dtype),
            jnp.asarray(2.0, dtype), jnp.asarray([np.sqrt(2.0)], dtype),
            jnp.asarray([0.0], dtype), jax.random.split(jax.random.key(1), 2),
            objectives=(_objective,), n_iter=2, chunk=16)
        assert fleet.xs.shape == (2, 2, 2)
        assert bool(fleet.has_safe.all())


class TestSwarmCampaigns:
    def test_sharded_swarm_fleet_matches_individual_runs(self, mesh):
        from safeopt_tpu.algorithms.swarm_opt_fused import SwarmIterState

        d = 2
        cap = 64
        gps, iter_states, greedy0s = [], [], []
        for seed in range(K):
            gp = _mk_gp(seed)
            gps.append(gp)
            x0 = np.asarray(gp.X)[0]
            S_buf = np.zeros((cap, d))
            S_buf[0] = x0
            dtype = gp.state.X.dtype
            iter_states.append(SwarmIterState(
                S=jnp.asarray(S_buf, dtype),
                count=jnp.asarray(1, jnp.int32),
                greedy=jnp.asarray(x0, dtype)))
            greedy0s.append(x0)

        kern = gps[0].kern
        dtype = gps[0].state.X.dtype
        vel = jnp.asarray([0.3, 0.3], dtype)
        bounds = jnp.asarray([[-3.0, 3.0], [-3.0, 3.0]], dtype)
        fmin = jnp.asarray([0.0], dtype)
        scaling = jnp.asarray([np.sqrt(2.0)], dtype)
        threshold = jnp.asarray([0.0], dtype)
        betas = np.full(N_ITER, 2.0)
        keys = jax.random.split(jax.random.key(3), K)
        blb0s = jnp.full((K,), -jnp.inf, dtype)
        greedy0s = jnp.asarray(np.stack(greedy0s), dtype)

        batched = stack_campaign_states([(g.state,) for g in gps])
        batched_iter = stack_campaign_states(iter_states)
        mesh_ = make_mesh()
        fleet = run_swarmopt_campaigns(
            (kern,), batched, batched_iter, keys, vel, bounds, fmin,
            scaling, threshold, betas, greedy0s, blb0s,
            objectives=(_objective,), n_iter=N_ITER, swarm_size=8,
            max_iters=10, mesh=mesh_)

        assert fleet.xs.shape == (K, N_ITER, d)
        assert bool((np.asarray(fleet.num_safe_min) > 0).all())
        for k in (0, 5):
            solo = run_swarmopt_loop(
                (kern,), (gps[k].state,), iter_states[k], keys[k], vel,
                bounds, fmin, scaling, threshold, betas,
                greedy0s[k], blb0s[k], objectives=(_objective,),
                n_iter=N_ITER, swarm_size=8, max_iters=10)
            np.testing.assert_allclose(np.asarray(fleet.xs[k]),
                                       np.asarray(solo.xs),
                                       rtol=1e-9, atol=1e-9)
            np.testing.assert_allclose(
                np.asarray(fleet.best_lower_bounds[k]),
                np.asarray(solo.best_lower_bounds), rtol=1e-9, atol=1e-9)


class TestHeterogeneousFleet:
    def test_per_campaign_objective_args(self, mesh):
        """objective_args_batch makes campaigns heterogeneous: each
        campaign optimizes a differently-shifted objective, and each
        sharded campaign reproduces its solo run exactly."""
        gps = [_mk_gp(seed) for seed in range(K)]
        kern = gps[0].kern
        grid = np.asarray(linearly_spaced_combinations(
            [(-2.0, 2.0), (-2.0, 2.0)], 17))
        dtype = gps[0].state.X.dtype
        centers = jnp.asarray(np.linspace(-0.8, 0.8, K)[:, None]
                              * np.ones((1, 2)), dtype)

        def objective(x, c):
            return 2.0 * jnp.exp(-0.5 * jnp.sum((x - c) ** 2))

        # per-campaign seed observations must match the shifted truth
        per_campaign = []
        for k in range(K):
            x0 = np.asarray(gps[k].X)
            y0 = 2.0 * np.exp(-0.5 * np.sum(
                (x0 - np.asarray(centers[k])) ** 2))
            per_campaign.append((
                type(gps[k])(x0, np.array([[y0]]), kern, noise_var=1e-4,
                             capacity=16).state,))
        batched = stack_campaign_states(per_campaign)
        keys = jax.random.split(jax.random.key(9), K)
        common = dict(objectives=(objective,), n_iter=3, chunk=16)

        fleet = run_safeopt_campaigns(
            (kern,), batched, jnp.asarray(grid), jnp.asarray([0.4], dtype),
            jnp.asarray(2.0, dtype), jnp.asarray([np.sqrt(2.0)], dtype),
            jnp.asarray([0.0], dtype), keys, mesh=mesh,
            objective_args_batch=centers, **common)
        assert bool(fleet.has_safe.all())
        # different plants -> different trajectories
        assert not np.allclose(np.asarray(fleet.xs[0]),
                               np.asarray(fleet.xs[-1]))
        for k in (0, K - 1):
            solo = run_safeopt_loop(
                (kern,), per_campaign[k], jnp.asarray(grid),
                jnp.asarray([0.4], dtype), jnp.asarray(2.0, dtype),
                jnp.asarray([np.sqrt(2.0)], dtype),
                jnp.asarray([0.0], dtype), keys[k],
                objective_args=centers[k], **common)
            np.testing.assert_array_equal(np.asarray(fleet.next_idx[k]),
                                          np.asarray(solo.next_idx))
            np.testing.assert_allclose(np.asarray(fleet.ys[k]),
                                       np.asarray(solo.ys), rtol=1e-10)


class TestHeterogeneousSwarmFleet:
    def test_swarm_per_campaign_objective_args(self, mesh):
        """Heterogeneous swarm fleet: per-campaign objective shifts,
        sharded == solo trajectories."""
        from safeopt_tpu.algorithms.swarm_opt_fused import SwarmIterState

        d = 2
        cap = 64
        Ks = 8        # == mesh axis size (must divide the campaign count)
        centers = jnp.asarray(np.linspace(-0.5, 0.5, Ks)[:, None]
                              * np.ones((1, d)))

        def objective(x, c):
            return 2.0 * jnp.exp(-0.5 * jnp.sum((x - c) ** 2))

        kern = RBF(d, variance=2.0, lengthscale=1.2)
        per_campaign, iter_states, greedy0s = [], [], []
        for k in range(Ks):
            x0 = np.asarray(centers[k])[None, :] * 0.5
            y0 = float(objective(jnp.asarray(x0[0]), centers[k]))
            gp = GPRegression(x0, np.array([[y0]]), kern, noise_var=1e-4,
                              capacity=16)
            per_campaign.append((gp.state,))
            S_buf = np.zeros((cap, d))
            S_buf[0] = x0[0]
            dtype = gp.state.X.dtype
            iter_states.append(SwarmIterState(
                S=jnp.asarray(S_buf, dtype),
                count=jnp.asarray(1, jnp.int32),
                greedy=jnp.asarray(x0[0], dtype)))
            greedy0s.append(x0[0])

        dtype = per_campaign[0][0].X.dtype
        vel = jnp.asarray([0.3, 0.3], dtype)
        bounds = jnp.asarray([[-3.0, 3.0], [-3.0, 3.0]], dtype)
        betas = np.full(3, 2.0)
        keys = jax.random.split(jax.random.key(6), Ks)
        common = dict(objectives=(objective,), n_iter=3, swarm_size=8,
                      max_iters=8)

        fleet = run_swarmopt_campaigns(
            (kern,), stack_campaign_states(per_campaign),
            stack_campaign_states(iter_states), keys, vel, bounds,
            jnp.asarray([0.0], dtype), jnp.asarray([np.sqrt(2.0)], dtype),
            jnp.asarray([0.0], dtype), betas,
            jnp.asarray(np.stack(greedy0s), dtype),
            jnp.full((Ks,), -jnp.inf, dtype),
            objective_args_batch=centers, mesh=mesh, **common)
        assert bool((np.asarray(fleet.num_safe_min) > 0).all())
        assert not np.allclose(np.asarray(fleet.xs[0]),
                               np.asarray(fleet.xs[-1]))

        solo = run_swarmopt_loop(
            (kern,), per_campaign[0], iter_states[0], keys[0], vel,
            bounds, jnp.asarray([0.0], dtype),
            jnp.asarray([np.sqrt(2.0)], dtype), jnp.asarray([0.0], dtype),
            betas, jnp.asarray(greedy0s[0], dtype),
            jnp.asarray(-jnp.inf, dtype), objective_args=centers[0],
            **common)
        np.testing.assert_allclose(np.asarray(fleet.xs[0]),
                                   np.asarray(solo.xs), rtol=1e-9,
                                   atol=1e-9)


class TestNewKernelFleet:
    """Round-3b kernels baked into the vmapped/sharded campaign loop:
    an RBF + Poly composition (dot-product family inside jit under
    vmap + mesh sharding) reproduces its solo runs."""

    def test_rbf_poly_fleet_matches_solo(self, mesh):
        from safeopt_tpu.gp import Poly

        kern = RBF(2, variance=2.0, lengthscale=1.2) \
            + Poly(2, variance=0.05, scale=0.1, bias=0.5, order=2.0)
        gps = []
        for seed in range(K):
            rng = np.random.default_rng(100 + seed)
            x0 = rng.uniform(-0.3, 0.3, size=(1, 2))
            y0 = 2.0 * np.exp(-0.5 * np.sum(x0 ** 2))
            gps.append(GPRegression(x0, np.array([[y0]]), kern.copy(),
                                    noise_var=1e-4, capacity=16))
        grid = np.asarray(linearly_spaced_combinations(
            [(-2.0, 2.0), (-2.0, 2.0)], 13))
        dtype = gps[0].state.X.dtype
        fmin = jnp.asarray([0.5], dtype)
        beta = jnp.asarray(2.0, dtype)
        scaling = jnp.asarray([np.sqrt(2.0 + 0.05 * 0.25)], dtype)
        threshold = jnp.asarray([0.0], dtype)
        keys = jax.random.split(jax.random.key(11), K)

        batched = stack_campaign_states([(g.state,) for g in gps])
        fleet = run_safeopt_campaigns(
            (kern,), batched, jnp.asarray(grid), fmin, beta,
            scaling, threshold, keys, objectives=(_objective,),
            n_iter=3, mesh=mesh, chunk=16)
        assert bool(fleet.has_safe.all())
        for k in (0, 5):
            solo = run_safeopt_loop(
                (kern,), (gps[k].state,), jnp.asarray(grid), fmin, beta,
                scaling, threshold, keys[k], objectives=(_objective,),
                n_iter=3, chunk=16)
            np.testing.assert_array_equal(np.asarray(fleet.next_idx[k]),
                                          np.asarray(solo.next_idx))
            np.testing.assert_allclose(np.asarray(fleet.xs[k]),
                                       np.asarray(solo.xs), atol=1e-12)
