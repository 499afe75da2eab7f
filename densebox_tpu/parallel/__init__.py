from densebox_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    param_shardings,
    shard_batch,
    state_shardings,
)
