from densebox_tpu.models.densebox import (  # noqa: F401
    TRUNK_PLAN,
    DenseBox,
    space_to_depth,
    trunk_plan,
    upsample2x_align_corners,
)
