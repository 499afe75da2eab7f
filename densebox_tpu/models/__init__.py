from densebox_tpu.models.densebox import (  # noqa: F401
    TRUNK_PLAN,
    DenseBox,
    upsample2x_align_corners,
)
