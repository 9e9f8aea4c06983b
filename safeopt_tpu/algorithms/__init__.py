"""Safe Bayesian optimization algorithms (SafeOpt, SafeOptSwarm, PSO)."""

from .base import GaussianProcessOptimization
from .safe_opt import SafeOpt
from .swarm import SwarmOptimization
from .swarm_opt import SafeOptSwarm

__all__ = ["GaussianProcessOptimization", "SafeOpt", "SafeOptSwarm",
           "SwarmOptimization"]
