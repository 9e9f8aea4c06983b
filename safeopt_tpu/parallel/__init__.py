"""Multi-chip sharding (mesh construction, grid/state placement)."""

from .sharding import (GRID_AXIS, MODEL_AXIS, make_mesh, replicate,
                       shard_grid, shard_state)

__all__ = ["make_mesh", "shard_grid", "shard_state", "replicate",
           "GRID_AXIS", "MODEL_AXIS"]
