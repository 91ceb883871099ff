from .mesh import make_mesh, batch_sharding, replicate, shard_params_tp
