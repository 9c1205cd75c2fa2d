from .mesh import (
    make_mesh,
    batch_sharding,
    batch_shardings,
    image_sharding,
    replicate,
    shard_batch,
    make_sharded_train_step,
)
