"""Campaign-parallel BO: shard independent campaigns across the mesh.

The fused SafeOpt / SafeOptSwarm iterations and the on-device loops
(``algorithms/runner.py``) are pure functions of their state pytrees,
so a *batch* of independent campaigns — multi-seed ensembles,
hyperparameter sweeps, per-robot tuning fleets — vmaps into one
program whose leading campaign axis is embarrassingly parallel.
Placing that axis on a ``jax.sharding.Mesh`` axis runs one (or more)
campaigns per chip with zero cross-chip communication inside the loop;
XLA partitions the vmapped program automatically from the input
shardings.

This is the multi-device story for the swarm path in particular: a
single swarm iteration is a small-batch program (20 particles) that
cannot productively span chips, but fleets of swarms can — the same
shape the reference's target domain (controller tuning per system
instance) scales in practice. No reference counterpart (SURVEY.md
section 2.10: the reference is single-process numpy).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["stack_campaign_states", "shard_campaigns",
           "run_safeopt_campaigns", "run_swarmopt_campaigns"]


def stack_campaign_states(per_campaign: Sequence[Tuple]):
    """Stack per-campaign GP state tuples into batched states.

    ``per_campaign`` is a sequence (length K) of per-GP state tuples as
    accepted by the on-device loops; returns one tuple of states whose
    every leaf has a leading campaign axis of size K. All campaigns
    must share capacities (pad to a common capacity first).
    """
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *per_campaign)


def shard_campaigns(tree, mesh, axis: str = "data"):
    """Place a batched campaign pytree with the leading axis on
    ``mesh[axis]``; the axis size must divide the campaign count (XLA
    requires the sharded dim to split evenly across the axis).

    On a multi-process mesh (``jax.distributed``) leaves are staged
    through the host first: ``device_put`` of a committed local device
    array onto a sharding with non-addressable devices is rejected,
    while host data shards fine (each process contributes its
    addressable shards of the identical global value).
    """
    def place(leaf):
        leaf = jnp.asarray(leaf)
        if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            # typed PRNG keys can't stage through numpy; shard the raw
            # uint32 key data (one extra trailing dim) and re-wrap
            impl = jax.random.key_impl(leaf)
            raw = place(jax.random.key_data(leaf))
            return jax.random.wrap_key_data(raw, impl=impl)
        spec = P(*([axis] + [None] * (leaf.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if not sharding.is_fully_addressable:
            leaf = jax.device_get(leaf)
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(place, tree)


def run_safeopt_campaigns(kernels, states_batch, grid, fmin, beta, scaling,
                          threshold, keys, *, objectives, n_iter: int,
                          mesh=None, axis: str = "data",
                          objective_args_batch=None, it_keys=None,
                          **loop_kwargs):
    """Run K independent on-device SafeOpt campaigns, one program.

    ``states_batch`` carries a leading campaign axis (see
    ``stack_campaign_states``); ``keys`` is a (K,) PRNG key batch. The
    grid, kernels and scalar settings are shared (replicated). With
    ``mesh`` given, the campaign axis is sharded over ``mesh[axis]``
    and each chip runs its share of campaigns independently.

    ``objective_args_batch`` (optional pytree, leading axis K) makes
    the fleet HETEROGENEOUS: campaign k's objectives are evaluated as
    ``f_i(x, tree[k])`` — e.g. tuning the same controller structure on
    K different plants, one per chip.

    Returns a ``BOLoopResult`` whose arrays all have the leading
    campaign axis.
    """
    from ..algorithms.runner import run_safeopt_loop

    def one(states, key, obj_args, it_keys_k):
        return run_safeopt_loop(kernels, states, grid, fmin, beta, scaling,
                                threshold, key, objectives=objectives,
                                n_iter=n_iter, objective_args=obj_args,
                                it_keys=it_keys_k, **loop_kwargs)

    if mesh is not None:
        states_batch = shard_campaigns(states_batch, mesh, axis)
        keys = shard_campaigns(keys, mesh, axis)
        if objective_args_batch is not None:
            objective_args_batch = shard_campaigns(objective_args_batch,
                                                   mesh, axis)
        if it_keys is not None:
            it_keys = shard_campaigns(it_keys, mesh, axis)
    in_axes = (0, 0, None if objective_args_batch is None else 0,
               None if it_keys is None else 0)
    return jax.vmap(one, in_axes=in_axes)(states_batch, keys,
                                          objective_args_batch, it_keys)


def run_swarmopt_campaigns(kernels, states_batch, iter_states, keys,
                           velocity_scale, bounds, fmin, scaling, threshold,
                           betas, greedy0s, blb0s, *, objectives,
                           n_iter: int, swarm_size: int, max_iters: int,
                           mesh=None, axis: str = "data",
                           objective_args_batch=None, it_keys=None,
                           **loop_kwargs):
    """Run K independent on-device SafeOptSwarm campaigns, one program.

    The swarm analog of ``run_safeopt_campaigns``: ``states_batch``,
    ``iter_states`` (device safe-set buffers), ``keys``, ``greedy0s``
    (K, d) and ``blb0s`` (K,) all carry the campaign axis; ``betas``
    (n_iter,) and the remaining scalars are shared.
    ``objective_args_batch`` (leading axis K) makes the fleet
    heterogeneous, as in ``run_safeopt_campaigns``. Zero cross-chip
    collectives — per-campaign swarms stay chip-local.

    Returns a ``SwarmLoopResult`` with the leading campaign axis.
    """
    from ..algorithms.runner import run_swarmopt_loop

    def one(states, sstate, key, greedy0, blb0, obj_args, it_keys_k):
        return run_swarmopt_loop(kernels, states, sstate, key,
                                 velocity_scale, bounds, fmin, scaling,
                                 threshold, betas, greedy0, blb0,
                                 objectives=objectives, n_iter=n_iter,
                                 swarm_size=swarm_size, max_iters=max_iters,
                                 objective_args=obj_args,
                                 it_keys=it_keys_k, **loop_kwargs)

    if mesh is not None:
        states_batch = shard_campaigns(states_batch, mesh, axis)
        iter_states = shard_campaigns(iter_states, mesh, axis)
        keys = shard_campaigns(keys, mesh, axis)
        greedy0s = shard_campaigns(greedy0s, mesh, axis)
        blb0s = shard_campaigns(blb0s, mesh, axis)
        if objective_args_batch is not None:
            objective_args_batch = shard_campaigns(objective_args_batch,
                                                   mesh, axis)
        if it_keys is not None:
            it_keys = shard_campaigns(it_keys, mesh, axis)
    in_axes = (0, 0, 0, 0, 0,
               None if objective_args_batch is None else 0,
               None if it_keys is None else 0)
    return jax.vmap(one, in_axes=in_axes)(states_batch, iter_states, keys,
                                          greedy0s, blb0s,
                                          objective_args_batch, it_keys)
