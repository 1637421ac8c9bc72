from .mesh import make_data_mesh, make_mesh
from .sharding import (
    batch_sharding,
    param_sharding_rules,
    replicate,
    shard_batch,
    shard_params,
)
from .distributed import host_local_batch, initialize, is_primary
