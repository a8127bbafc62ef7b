from .mesh import data_sharding, make_mesh, replicate, shard_rows
