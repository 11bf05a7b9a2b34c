"""R(2+1)D video ResNet (reference ``models/rnet2dp1.py``).

Behavior contract:
  * ``Conv2Plus1D`` (reference ``:39-59``): a 3-D conv factorized into a
    (1,3,3) spatial conv → BN → ReLU → (3,1,1) temporal conv, with the
    canonical midplanes count ``(Cin·Cout·27) // (Cin·9 + 3·Cout)``.
  * Stem (``R2Plus1dStem :176``, 1-channel echo variant): (1,7,7) s(1,2,2)
    conv to 45 ch → BN/ReLU → (3,1,1) conv to 64 → BN/ReLU.
  * 4 basic-block stages [2,2,2,2] at 64/128/256/512, stride-2 (t,h,w)
    downsampling from stage 2; global avg-pool; Linear head.
  * ``r2plus1d_18_iekd`` (``:436``) additionally returns the pooled feature
    alongside the logits (reference ``:339``).

TPU-first: N,T,H,W,C layout; the (2+1)D factorization already maps onto two
MXU-friendly convs.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

_BN = dict(epsilon=1e-5, momentum=0.9)


def _midplanes(cin: int, cout: int) -> int:
    return (cin * cout * 3 * 3 * 3) // (cin * 3 * 3 + 3 * cout)


class Conv2Plus1D(nn.Module):
    features: int
    midplanes: int
    strides: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        s = self.strides
        x = nn.Conv(self.midplanes, (1, 3, 3), strides=(1, s, s),
                    padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="spatial")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn",
                         dtype=self.dtype, **_BN)(x)
        x = nn.relu(x)
        return nn.Conv(self.features, (3, 1, 1), strides=(s, 1, 1),
                       padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                       dtype=self.dtype, name="temporal")(x)


class R2Plus1DBlock(nn.Module):
    planes: int
    strides: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)  # identity shortcut must not promote
        # ONE midplanes from (inplanes, planes), reused by BOTH convs —
        # reference rnet2dp1.py:89-99 (and torchvision) compute it once,
        # so conv2's bottleneck width follows the block's INPUT channels
        mid = _midplanes(x.shape[-1], self.planes)
        residual = x
        y = Conv2Plus1D(self.planes, mid, self.strides, dtype=self.dtype,
                        name="conv1")(x, train)
        y = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=self.dtype, **_BN)(y)
        y = nn.relu(y)
        y = Conv2Plus1D(self.planes, mid, dtype=self.dtype,
                        name="conv2")(y, train)
        y = nn.BatchNorm(use_running_average=not train, name="bn2",
                         dtype=self.dtype, **_BN)(y)
        if self.strides != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1, 1),
                               strides=(self.strides,) * 3, use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="down_bn",
                                        dtype=self.dtype, **_BN)(residual)
        return nn.relu(y + residual)


class R2Plus1D18(nn.Module):
    """Input (B, T, H, W, 1) → logits (B, num_classes)[, pooled feature].

    return_features=True reproduces r2plus1d_18_iekd's (logits, feature)
    pair (reference rnet2dp1.py:320-339).
    """

    num_classes: int = 400
    layers: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    return_features: bool = False
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem (R2Plus1dStem, 1-ch echo variant)
        x = nn.Conv(45, (1, 7, 7), strides=(1, 2, 2),
                    padding=((0, 0), (3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="stem_spatial")(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn1",
                         dtype=self.dtype, **_BN)(x)
        x = nn.relu(x)
        x = nn.Conv(self.widths[0], (3, 1, 1),
                    padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                    dtype=self.dtype, name="stem_temporal")(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn2",
                         dtype=self.dtype, **_BN)(x)
        x = nn.relu(x)

        for li, (planes, blocks) in enumerate(zip(self.widths, self.layers)):
            stride = 1 if li == 0 else 2
            for b in range(blocks):
                x = R2Plus1DBlock(planes, strides=stride if b == 0 else 1,
                                  dtype=self.dtype,
                                  name=f"layer{li + 1}_b{b}")(x, train)

        feat = jnp.mean(x, axis=(1, 2, 3))  # (B, C)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="fc")(feat)
        if self.return_features:
            return logits, feat
        return logits


def r2plus1d_18(num_classes: int = 400) -> R2Plus1D18:
    return R2Plus1D18(num_classes=num_classes)


def r2plus1d_18_iekd(num_classes: int = 400) -> R2Plus1D18:
    return R2Plus1D18(num_classes=num_classes, return_features=True)
