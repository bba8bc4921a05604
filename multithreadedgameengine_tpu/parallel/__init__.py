from .sharded import make_mesh, shard_world, make_sharded_step  # noqa: F401
from .halo import make_halo_step  # noqa: F401
from .homed import make_homed_step  # noqa: F401
