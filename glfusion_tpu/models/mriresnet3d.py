"""MedicalNet-style dilated 3-D ResNet + 2-modality PFS regressor
(reference ``models/mriresnet3d.py``).

Behavior contract:
  * ``ResNet`` (``:114-218``): 1-ch 7³ stem stride 2, maxpool 3³ s2,
    4 stages where layer3/4 keep stride 1 with dilations 2/4 (MedicalNet),
    then a ``conv_seg`` head: ConvTranspose3d(2,2)→BN→ReLU→3³ conv→BN→ReLU
    →1×1×1 conv to num_seg_classes (a coarse segmentation map).
  * Depth ctors resnet10..200 (``:222-270``) share the torch depth table.
  * ``Resnet50PFS`` (``:271-336``): two modalities fold into batch, a
    resnet101 produces per-modality seg maps; a resnet18 whose head is a
    global avg-pool projects each map to a 512-d feature; features of the
    2 modalities concat → Linear → n_output_channels. Returns (out, seg).

TPU-first: NDHWC; modality folding is a reshape; the per-modality loop is
one batched graph.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from glfusion_tpu.models.resnet3d import DEPTH_TABLE

_BN = dict(epsilon=1e-5, momentum=0.9)


class _Block3D(nn.Module):
    """Basic or bottleneck 3-D residual block with dilation (reference :52-112)."""

    planes: int
    kind: str  # 'basic' | 'bottleneck'
    strides: int = 1
    dilation: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)  # identity shortcut must not promote
        d = self.dilation
        out_ch = self.planes * (4 if self.kind == "bottleneck" else 1)
        residual = x

        if self.kind == "basic":
            y = nn.Conv(self.planes, (3, 3, 3), strides=(self.strides,) * 3,
                        padding=((d, d),) * 3, kernel_dilation=(d,) * 3,
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
            y = nn.BatchNorm(use_running_average=not train, name="bn1",
                             dtype=self.dtype, **_BN)(y)
            y = nn.relu(y)
            y = nn.Conv(self.planes, (3, 3, 3), padding=((d, d),) * 3,
                        kernel_dilation=(d,) * 3, use_bias=False,
                        dtype=self.dtype, name="conv2")(y)
            y = nn.BatchNorm(use_running_average=not train, name="bn2",
                             dtype=self.dtype, **_BN)(y)
        else:
            y = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
            y = nn.BatchNorm(use_running_average=not train, name="bn1",
                             dtype=self.dtype, **_BN)(y)
            y = nn.relu(y)
            y = nn.Conv(self.planes, (3, 3, 3), strides=(self.strides,) * 3,
                        padding=((d, d),) * 3, kernel_dilation=(d,) * 3,
                        use_bias=False, dtype=self.dtype, name="conv2")(y)
            y = nn.BatchNorm(use_running_average=not train, name="bn2",
                             dtype=self.dtype, **_BN)(y)
            y = nn.relu(y)
            y = nn.Conv(out_ch, (1, 1, 1), use_bias=False,
                        dtype=self.dtype, name="conv3")(y)
            y = nn.BatchNorm(use_running_average=not train, name="bn3",
                             dtype=self.dtype, **_BN)(y)

        if self.strides != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1, 1),
                               strides=(self.strides,) * 3, use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="down_bn",
                                        dtype=self.dtype, **_BN)(residual)
        return nn.relu(y + residual)


class MRIResNet3D(nn.Module):
    """Dilated 3-D ResNet; pool_head=True swaps conv_seg for global avg-pool
    (the Resnet50PFS projector trick, reference ``:296-301``)."""

    depth: int = 101
    num_seg_classes: int = 1
    widths: Sequence[int] = (64, 128, 256, 512)
    pool_head: bool = False
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        kind, layers = DEPTH_TABLE[self.depth]
        x = nn.Conv(64, (7, 7, 7), strides=(2, 2, 2),
                    padding=((3, 3),) * 3, use_bias=False,
                             dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=self.dtype, **_BN)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding=((1, 1),) * 3)
        stage_cfg = ((1, 1), (2, 1), (1, 2), (1, 4))  # (stride, dilation)
        for li, (planes, blocks) in enumerate(zip(self.widths, layers)):
            stride, dil = stage_cfg[li]
            for b in range(blocks):
                x = _Block3D(planes, kind, strides=stride if b == 0 else 1,
                             dilation=dil, dtype=self.dtype,
                             name=f"layer{li + 1}_b{b}")(x, train)
        if self.pool_head:
            return jnp.mean(x, axis=(1, 2, 3))  # (B, C)
        # conv_seg head (reference :147-171)
        y = nn.ConvTranspose(32, (2, 2, 2), strides=(2, 2, 2),
                             padding="VALID", dtype=self.dtype,
                             name="seg_deconv")(x)
        y = nn.BatchNorm(use_running_average=not train, name="seg_bn1",
                         dtype=self.dtype, **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(32, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                    dtype=self.dtype, name="seg_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, name="seg_bn2",
                         dtype=self.dtype, **_BN)(y)
        y = nn.relu(y)
        return nn.Conv(self.num_seg_classes, (1, 1, 1), use_bias=False,
                       dtype=self.dtype, name="seg_out")(y)


class Resnet50PFS(nn.Module):
    """2-modality MRI volumes → regression (reference mriresnet3d.py:271-336).

    Input (B, M=2, D, H, W) single-channel volumes. A depth-101 net maps each
    modality to a seg map; a depth-18 pooled projector gives 512-d features;
    concat over modalities → Linear. Returns (out (B, n_outputs), seg maps).
    """

    n_outputs: int = 12
    main_depth: int = 101
    proj_depth: int = 18
    widths: Sequence[int] = (64, 128, 256, 512)
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, m = x.shape[0], x.shape[1]
        flat = x.reshape((b * m,) + x.shape[2:] + (1,))  # fold modalities
        seg = MRIResNet3D(depth=self.main_depth, num_seg_classes=1,
                          widths=tuple(self.widths), dtype=self.dtype,
                          name="model")(flat, train)
        feats = MRIResNet3D(depth=self.proj_depth, pool_head=True,
                            widths=tuple(self.widths), dtype=self.dtype,
                            name="conv_projection")(seg, train)  # (B·M, 512)
        feats = feats.reshape(b, m * feats.shape[-1])
        out = nn.Dense(self.n_outputs, dtype=self.dtype,
                       name="fc_projection")(feats)
        return out, seg
