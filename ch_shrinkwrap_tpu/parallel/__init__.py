from .sharding import (
    make_device_mesh,
    shard_points,
    sharded_cg_block,
)
