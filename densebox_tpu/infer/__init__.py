from densebox_tpu.infer.detector import (  # noqa: F401
    decode_landmarks,
    detect_batch,
    make_detect_fn,
    pyramid_shapes,
)
