from .mesh import (
    make_mesh,
    batch_group_size,
    batch_sharding,
    batch_shardings,
    image_sharding,
    replicate,
    shard_batch,
    make_sharded_train_step,
)
from .multihost import (init_multihost, local_batch_rows, put_state,
                        shard_host_batch)
from .pipeline import (
    PipelinedModel,
    make_pp_loss,
    make_pp_mesh,
    make_pp_train_step,
    pp_shardings,
    split_tokens,
)
