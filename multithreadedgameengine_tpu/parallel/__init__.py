from .sharded import make_mesh, shard_world, make_sharded_step  # noqa: F401
