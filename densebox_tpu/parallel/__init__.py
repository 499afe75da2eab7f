from densebox_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    param_shardings,
    place_host_batch,
    place_host_state,
    shard_batch,
    state_shardings,
)
from densebox_tpu.parallel.multihost import (  # noqa: F401
    ensure_distributed,
    is_primary,
)
