from tomobar_tpu.parallel.sharding import (
    ShardedProjector,
    distributed_init,
    make_mesh,
)
from tomobar_tpu.parallel.direct import ShardedDirect

__all__ = [
    "ShardedProjector",
    "ShardedDirect",
    "distributed_init",
    "make_mesh",
]
