"""densebox_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the DenseBox detector.

Capability contract: CaptainEven/DenseBox (PyTorch, single-GPU). The reference
mount at /root/reference was EMPTY at build time (see SURVEY.md §0 for the
evidence); the authoritative spec is therefore SURVEY.md + BASELINE.json's
north star + the DenseBox paper (arXiv:1509.04874). Every module cites the
spec section it implements.

Design is TPU-first, not a torch translation:
  * model: Flax NHWC conv stack, one fused XLA program, bf16-ready (models/)
  * GT rasterizer + OHEM loss: on-device, jit-safe, Pallas-backed (ops/)
  * decode + NMS: fixed-shape top-k + in-graph greedy NMS, never leaves HBM (ops/)
  * parallelism: jax.sharding Mesh + pjit DP, spatial (halo) sharding (parallel/)
"""

__version__ = "0.1.0"

from densebox_tpu.config import (  # noqa: F401
    DenseBoxConfig,
    InferCfg,
    LabelCfg,
    LossCfg,
    ModelCfg,
    TrainCfg,
)
