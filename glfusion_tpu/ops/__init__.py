"""Device-side ops: preprocessing, resizing, pooling, fused attention."""

from glfusion_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
)
from glfusion_tpu.ops.crops import center_crop, random_crop  # noqa: F401
from glfusion_tpu.ops.masks import mask_to_allclass, view_label_table  # noqa: F401
from glfusion_tpu.ops.pooling import max_pool_3x3_s2  # noqa: F401
from glfusion_tpu.ops.nonlocal_attn import dot_nonlocal_attention  # noqa: F401
