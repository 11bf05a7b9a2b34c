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


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (off with GLFUSION_NO_JIT_CACHE=1).

    Full-size train-step compiles take minutes on remote TPU transports;
    the on-disk cache makes every process after the first start instantly.
    """
    import os

    if os.environ.get("GLFUSION_NO_JIT_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "GLFUSION_JIT_CACHE_DIR",
            os.path.expanduser("~/.cache/glfusion_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()

from glfusion_tpu.config import (  # noqa: F401
    Config,
    DataConfig,
    ModelConfig,
    OptConfig,
    TrainConfig,
)
