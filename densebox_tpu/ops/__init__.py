from densebox_tpu.ops.decode import decode_topk  # noqa: F401
from densebox_tpu.ops.nms import iou_matrix, nms  # noqa: F401
