"""Device mesh + sharding: SPMD scaling over ICI (replaces torch DataParallel).

The reference's only parallelism is single-process ``torch.nn.DataParallel``
over 4 GPUs (reference ``main.py:155``). Here the equivalent — and more — is a
``jax.sharding.Mesh`` with a ``data`` axis (batch/data parallel; gradient
``psum`` inserted by GSPMD) and a ``model`` axis (tensor-parallel channel
sharding of the 2048-wide backbone/fusion weights). No NCCL-style calls:
XLA emits the collectives.
"""

from glfusion_tpu.parallel.mesh import make_mesh  # noqa: F401
from glfusion_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    device_put_global,
    shard_batch,
    shard_variables,
    variable_pspec,
)
