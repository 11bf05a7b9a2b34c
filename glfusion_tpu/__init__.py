"""glfusion_tpu — TPU-native multi-view echocardiogram segmentation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of GL-Fusion
(xmed-lab/GL-Fusion, MICCAI'23): multi-view echo video segmentation of five
cardiac structures (RA, RV, LA, LV, PA) with per-view ResNet-50/DeepLabV3
encoders, global (MGFM) and local (MLFM) cross-view non-local fusion, and a
temporal cycle-consistency training loss.

Design (TPU-first, not a port):
  * NHWC layout everywhere; views are a stacked leading axis with stacked
    per-view parameters (``jax.vmap`` over the view axis) instead of the
    reference's sequential per-view Python loops.
  * All preprocessing (nearest resize, crop, normalize, 5-class mask
    remapping) is jit-compiled on device.
  * The TPAVI non-local fusion attention runs as a fused Pallas kernel.
  * Scaling is a ``jax.sharding.Mesh`` with data-parallel batches and
    GSPMD tensor-parallel channel sharding — no NCCL-style code.
"""

__version__ = "0.1.0"

from glfusion_tpu.config import (  # noqa: F401
    Config,
    DataConfig,
    ModelConfig,
    OptConfig,
    TrainConfig,
)
