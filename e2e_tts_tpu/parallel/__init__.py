from .mesh import make_data_mesh, make_mesh
from .sharding import batch_sharding, param_sharding_rules, shard_params, shard_batch
from .distributed import host_local_batch, initialize, is_primary
