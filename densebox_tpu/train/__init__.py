from densebox_tpu.train.loop import (  # noqa: F401
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from densebox_tpu.train.trainer import fit, make_canvas_train_step  # noqa: F401
