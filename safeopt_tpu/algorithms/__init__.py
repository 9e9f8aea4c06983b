"""Safe Bayesian optimization algorithms (SafeOpt, SafeOptSwarm, PSO).

On-device campaign loops (``run_safeopt_loop`` / ``run_swarmopt_loop``)
live in ``algorithms.runner`` — imported lazily to keep package import
light.
"""

from .base import GaussianProcessOptimization
from .pipeline import run_lagged_campaign
from .safe_opt import PendingSafeOptStep, SafeOpt
from .swarm import SwarmOptimization
from .swarm_opt import PendingSwarmIteration, SafeOptSwarm

__all__ = ["GaussianProcessOptimization", "SafeOpt", "SafeOptSwarm",
           "SwarmOptimization", "PendingSafeOptStep",
           "PendingSwarmIteration", "run_lagged_campaign"]
