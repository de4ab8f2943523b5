from .sharding import (cell_mesh, initialize_distributed, replicate,
                       shard_sources, shard_state, state_shardings)
