"""Pallas TPU kernels — the framework's "native" layer (SURVEY.md §3.2).

The reference's only native surface is inherited CUDA (cuDNN convs,
torchvision NMS); the TPU-native equivalent of a CUDA kernel is a Pallas
kernel. The north star additionally elevates GT rasterization and the OHEM
loss to kernel status (BASELINE.json:5). Every kernel here has a pure-jax
twin in densebox_tpu/ops/ with an identical contract; tests assert they
match, and the pure-jax version remains the default on non-TPU backends
(kernels run in interpret mode there).
"""

from densebox_tpu.ops.pallas.labels import rasterize_batch_pallas  # noqa: F401
from densebox_tpu.ops.pallas.nms import nms_pallas  # noqa: F401
from densebox_tpu.ops.pallas.ohem import ohem_mask_pallas  # noqa: F401
