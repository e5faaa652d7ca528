from multimodalrouting_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    constrain,
    make_mesh,
    replicate_sharding,
    shard_batch,
)
