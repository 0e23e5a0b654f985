from crog_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    replicate,
    shard_batch,
    data_sharding,
    replicated_sharding,
)
