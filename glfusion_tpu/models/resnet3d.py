"""3-D ResNet with ECA attention + mPAP regression head
(reference ``models/resnet3d.py``).

Behavior contract:
  * ``eca_layer`` (reference ``:11-34``): global avg-pool to (1,1,1), a
    1-D conv of size k over the CHANNEL axis, sigmoid gate, channel reweight.
  * BasicBlock/Bottleneck (``:67-146``) are standard 3-D residual blocks
    with ECA applied to the last BN output before the residual add.
  * ``ResNet`` (``:146-330``): (7,7,7-t) stem stride (t,2,2), maxpool 3³ s2,
    4 stages, global avg-pool; ``forward`` returns the POOLED FEATURE (the
    fc is detached in the reference, ``:229``/``:316``).
  * ``generate_model`` depth table (``:335-352``); ``Resnet50PAH`` (``:355``)
    wraps depth-101 with a 1-channel (7,7,7) s2 stem and a Linear head to a
    scalar (mPAP regression).

TPU-first: NDHWC; ECA's channel conv is a same-padded 1-D convolution via
``lax.conv_general_dilated`` over the channel axis.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_BN = dict(epsilon=1e-5, momentum=0.9)

DEPTH_TABLE = {
    10: ("basic", (1, 1, 1, 1)),
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),
}


class ECALayer(nn.Module):
    """Efficient Channel Attention (reference resnet3d.py:11-34)."""

    k_size: int = 3
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):  # (B, D, H, W, C)
        y = jnp.mean(x, axis=(1, 2, 3)).astype(self.dtype)  # (B, C)
        w = self.param("conv_kernel", nn.initializers.lecun_normal(),
                       (self.k_size, 1, 1))
        y = jax.lax.conv_general_dilated(
            y[:, :, None], w.astype(self.dtype), window_strides=(1,),
            padding=((self.k_size // 2, self.k_size // 2),),
            dimension_numbers=("NWC", "WIO", "NWC"))
        gate = nn.sigmoid(y[:, :, 0])  # (B, C)
        return x * gate[:, None, None, None, :].astype(x.dtype)


class BasicBlock3D(nn.Module):
    planes: int
    strides: int = 1
    k_size: int = 3
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)  # identity shortcut must not promote
        residual = x
        y = nn.Conv(self.planes, (3, 3, 3), strides=(self.strides,) * 3,
                    padding=((1, 1),) * 3, use_bias=False,
                             dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=self.dtype, **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3, 3), padding=((1, 1),) * 3,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2",
                         dtype=self.dtype, **_BN)(y)
        y = ECALayer(self.k_size, dtype=self.dtype, name="eca")(y)
        if self.strides != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1, 1),
                               strides=(self.strides,) * 3, use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="down_bn",
                                        dtype=self.dtype, **_BN)(residual)
        return nn.relu(y + residual)


class Bottleneck3D(nn.Module):
    planes: int
    strides: int = 1
    k_size: int = 3
    dilation: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)  # identity shortcut must not promote
        out_ch = self.planes * 4
        d = self.dilation
        residual = x
        y = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=self.dtype, **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3, 3), strides=(self.strides,) * 3,
                    padding=((d, d),) * 3, kernel_dilation=(d, d, d),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2",
                         dtype=self.dtype, **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn3",
                         dtype=self.dtype, **_BN)(y)
        y = ECALayer(self.k_size, dtype=self.dtype, name="eca")(y)
        if self.strides != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1, 1),
                               strides=(self.strides,) * 3, use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="down_bn",
                                        dtype=self.dtype, **_BN)(residual)
        return nn.relu(y + residual)


class ResNet3D(nn.Module):
    """Input (B, D, H, W, C_in) → pooled feature (B, C_out)."""

    depth: int = 50
    widths: Sequence[int] = (64, 128, 256, 512)
    conv1_t_size: int = 7
    conv1_t_stride: int = 1
    no_max_pool: bool = False
    widen_factor: float = 1.0
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        kind, layers = DEPTH_TABLE[self.depth]
        widths = [int(w * self.widen_factor) for w in self.widths]
        t = self.conv1_t_size
        x = nn.Conv(widths[0], (t, 7, 7),
                    strides=(self.conv1_t_stride, 2, 2),
                    padding=((t // 2, t // 2), (3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=self.dtype, **_BN)(x)
        x = nn.relu(x)
        if not self.no_max_pool:
            x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                            padding=((1, 1),) * 3)
        block = BasicBlock3D if kind == "basic" else Bottleneck3D
        for li, (planes, blocks) in enumerate(zip(widths, layers)):
            stride = 1 if li == 0 else 2
            for b in range(blocks):
                x = block(planes, strides=stride if b == 0 else 1,
                          dtype=self.dtype,
                          name=f"layer{li + 1}_b{b}")(x, train)
        return jnp.mean(x, axis=(1, 2, 3))  # (B, C)


class Resnet50PAH(nn.Module):
    """Video → scalar mPAP regression (reference resnet3d.py:355-416):
    depth-101 backbone with 1-ch (7,7,7) s2 stem, Linear head."""

    depth: int = 101
    n_outputs: int = 1
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ResNet3D(depth=self.depth, conv1_t_size=7, conv1_t_stride=2,
                        dtype=self.dtype, name="backbone")(x, train)
        return nn.Dense(self.n_outputs, dtype=self.dtype,
                        name="projection")(feat)
