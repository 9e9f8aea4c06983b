"""Generic constrained swarm optimization (public API component).

Stateful wrapper over the fused scan core (``swarm_core.swarm_scan``),
mirroring the reference's ``SwarmOptimization`` surface
(/root/reference/safeopt/swarm.py:17-146): ``c1``/``c2``,
``velocity_scale``, ``max_velocity``, ``init_swarm(positions)``,
``run_swarm(max_iter)``, and the ``positions``/``velocities``/
``best_positions``/``best_values``/``global_best`` attributes.

The fitness callable must be JAX-traceable (it is fused into the
compiled scan). Randomness comes from an explicit PRNG key instead of
the reference's global NumPy RNG.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_dtype
from .swarm_core import make_uniform_stream, swarm_scan

__all__ = ["SwarmOptimization"]


class SwarmOptimization:
    """Constrained particle swarm optimization.

    Parameters
    ----------
    swarm_size : int
        Number of particles.
    velocity : array (d,)
        Base velocity per dimension (sets both the initial velocity
        scale and the max velocity = 10x).
    fitness : callable
        ``positions (S, d) -> (values (S,), safe (S,) bool)``; must be
        JAX-traceable — it is compiled into the swarm scan.
    bounds : list of (min, max), optional
        Exploration box per dimension.
    key : jax PRNG key, optional
        Randomness source (default ``jax.random.key(0)``).
    """

    def __init__(self, swarm_size: int, velocity, fitness: Callable,
                 bounds=None, key: Optional[jax.Array] = None):
        self.c1 = self.c2 = 1.0
        self.fitness = fitness

        self.bounds = None
        if bounds is not None:
            self.bounds = np.asarray(bounds, dtype=float)

        self.initial_inertia = 1.0
        self.final_inertia = 0.1
        self.velocity_scale = np.asarray(velocity, dtype=float)

        self.ndim = len(self.velocity_scale)
        self.swarm_size = swarm_size
        self._key = key if key is not None else jax.random.key(0)

        dtype = default_dtype()
        self.positions = jnp.zeros((swarm_size, self.ndim), dtype=dtype)
        self.velocities = jnp.zeros_like(self.positions)
        self.best_positions = jnp.zeros_like(self.positions)
        self.best_values = jnp.zeros((swarm_size,), dtype=dtype)
        self.global_best = None

    @property
    def max_velocity(self) -> np.ndarray:
        """Maximum allowed particle velocity (10x the base velocity)."""
        return 10.0 * self.velocity_scale

    def _split(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def init_swarm(self, positions, velocities=None) -> None:
        """Set initial positions; draw velocities ~ U[0,1)*scale.

        Matches reference swarm.py:66-84 (initial bests are seeded from
        the first fitness evaluation regardless of safety).
        """
        dtype = default_dtype()
        self.positions = jnp.asarray(positions, dtype=dtype)
        if velocities is None:
            u = jax.random.uniform(self._split(),
                                   (self.swarm_size, self.ndim), dtype=dtype)
            velocities = u * jnp.asarray(self.velocity_scale, dtype)
        self.velocities = jnp.asarray(velocities, dtype=dtype)

        values, _ = self.fitness(self.positions)
        self.best_positions = self.positions
        self.best_values = jnp.asarray(values)
        self.global_best = self.best_positions[jnp.argmax(values)]

    def run_swarm(self, max_iter: int, r_stream=None) -> None:
        """Explore for ``max_iter`` iterations (one fused device scan).

        ``r_stream`` overrides the uniform randomness (parity testing).
        """
        dtype = self.positions.dtype
        if r_stream is None:
            r_stream = make_uniform_stream(self._split(), max_iter,
                                           self.swarm_size, self.ndim, dtype)
        else:
            r_stream = jnp.asarray(r_stream, dtype=dtype)

        result = swarm_scan(
            self.fitness, self.positions, self.velocities, r_stream,
            jnp.asarray(self.velocity_scale, dtype),
            None if self.bounds is None else jnp.asarray(self.bounds, dtype),
            c1=self.c1, c2=self.c2,
            initial_inertia=self.initial_inertia,
            final_inertia=self.final_inertia)

        self.positions = result.positions
        self.velocities = result.velocities
        self.best_positions = result.best_positions
        self.best_values = result.best_values
        self.global_best = result.global_best
