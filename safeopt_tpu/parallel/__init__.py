"""Multi-chip sharding (mesh construction, grid/state placement,
campaign-parallel fleets)."""

from .campaigns import (run_safeopt_campaigns, run_swarmopt_campaigns,
                        shard_campaigns, stack_campaign_states)
from .sharding import (DCN_AXIS, GRID_AXIS, MODEL_AXIS, make_hier_mesh,
                       make_mesh, replicate, shard_grid, shard_state)

__all__ = ["make_mesh", "make_hier_mesh", "shard_grid", "shard_state",
           "replicate", "GRID_AXIS", "MODEL_AXIS", "DCN_AXIS",
           "stack_campaign_states",
           "shard_campaigns", "run_safeopt_campaigns",
           "run_swarmopt_campaigns"]
