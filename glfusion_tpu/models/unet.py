"""U-Net baseline family, TPU-native (flax / NHWC).

One parameterized implementation covers the reference's four variants
(``models/unet.py``): ``U_Net :138``, ``R2U_Net :204``, ``AttU_Net :276``,
``R2AttU_Net :349`` — selected by the ``recurrent`` / ``attention`` flags
instead of four near-duplicate classes.

Behavioral contract per variant:
  * 5 encoder stages at widths (64,128,256,512,1024) with 2×2 maxpool
    between stages; decoder mirrors with nearest ×2 upsample + 3×3 conv
    (``up_conv :46``), skip concat, then a double conv (``conv_block :29``)
    or recurrent RRCNN block (``RRCNN_block :80``); final 1×1 conv head.
  * Recurrent block (``Recurrent_block :60``): a single shared conv applied
    t+1 times as x1 = conv(x + x1), x1₀ = conv(x); RRCNN = 1×1 in-proj then
    two recurrent blocks with residual around the pair.
  * Attention gate (``Attention_block :108``): psi = sigmoid(BN(1×1(relu(
    BN(1×1 g) + BN(1×1 x))))); skip connection scaled by psi before concat.

TPU-first: widths are configurable so tests run tiny; channels-last keeps
convs MXU-friendly; the recurrent loop is a static Python loop (t is a
compile-time constant) so XLA unrolls and fuses it.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

_BN = dict(epsilon=1e-5, momentum=0.9)


def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor ×2 (torch nn.Upsample default mode)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=((p, p), (p, p)), use_bias=True,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         **_BN)(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    """conv_block (reference models/unet.py:29-44): two 3×3 conv-BN-ReLU."""

    features: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBNRelu(self.features, dtype=self.dtype, name="conv1")(x, train)
        return ConvBNRelu(self.features, dtype=self.dtype,
                          name="conv2")(x, train)


class UpConv(nn.Module):
    """up_conv (reference models/unet.py:46-58): ×2 upsample, 3×3 conv-BN-ReLU."""

    features: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        return ConvBNRelu(self.features, dtype=self.dtype,
                          name="conv")(_upsample_2x(x), train)


class RecurrentBlock(nn.Module):
    """Recurrent_block (reference models/unet.py:60-79): shared conv, t+1 apps."""

    features: int
    t: int = 2
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        conv = ConvBNRelu(self.features, dtype=self.dtype, name="conv")
        x1 = conv(x, train)
        for _ in range(self.t):
            x1 = conv(x + x1, train)
        return x1


class RRCNNBlock(nn.Module):
    """RRCNN_block (reference models/unet.py:80-93): 1×1 proj + 2 recurrent, residual."""

    features: int
    t: int = 2
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="proj")(x)
        x1 = RecurrentBlock(self.features, self.t, dtype=self.dtype,
                            name="rcnn1")(x, train)
        x1 = RecurrentBlock(self.features, self.t, dtype=self.dtype,
                            name="rcnn2")(x1, train)
        return x + x1


class AttentionGate(nn.Module):
    """Attention_block (reference models/unet.py:108-136)."""

    inter: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, g, x, train: bool):
        g1 = nn.Conv(self.inter, (1, 1), dtype=self.dtype, name="w_g")(g)
        g1 = nn.BatchNorm(use_running_average=not train, name="w_g_bn",
                          dtype=self.dtype, **_BN)(g1)
        x1 = nn.Conv(self.inter, (1, 1), dtype=self.dtype, name="w_x")(x)
        x1 = nn.BatchNorm(use_running_average=not train, name="w_x_bn",
                          dtype=self.dtype, **_BN)(x1)
        psi = nn.relu(g1 + x1)
        psi = nn.Conv(1, (1, 1), dtype=self.dtype, name="psi")(psi)
        psi = nn.BatchNorm(use_running_average=not train, name="psi_bn",
                           dtype=self.dtype, **_BN)(psi)
        return x * nn.sigmoid(psi)


class UNet(nn.Module):
    """The 4-variant U-Net family behind one interface.

    recurrent=False, attention=False → U_Net   (reference :138)
    recurrent=True,  attention=False → R2U_Net (reference :204)
    recurrent=False, attention=True  → AttU_Net (reference :276)
    recurrent=True,  attention=True  → R2AttU_Net (reference :349)
    """

    out_channels: int = 1
    widths: Sequence[int] = (64, 128, 256, 512, 1024)
    recurrent: bool = False
    attention: bool = False
    t: int = 2
    return_features: bool = False  # also return the deepest encoder stage
    dtype: str = "float32"  # compute dtype (params stay fp32)

    def _block(self, features: int, name: str):
        if self.recurrent:
            return RRCNNBlock(features, self.t, dtype=self.dtype, name=name)
        return DoubleConv(features, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """(B, H, W, C_in) → (B, H, W, out_channels) logits. H, W % 16 == 0.

        return_features=True → (logits, bottleneck) where bottleneck is the
        H/16 deepest encoder stage — the cycle-feature tap for the trainable
        registry adapter (the reference never trains this family, so the
        tap is this repo's train contract, like models/registry.py's)."""
        widths = tuple(self.widths)
        skips = []
        for i, wdt in enumerate(widths):
            if i > 0:
                x = _max_pool_2x2(x)
            x = self._block(wdt, name=f"enc{i + 1}")(x, train)
            skips.append(x)
        bottleneck = skips[-1]

        for i in range(len(widths) - 2, -1, -1):
            wdt = widths[i]
            x = UpConv(wdt, dtype=self.dtype, name=f"up{i + 2}")(x, train)
            skip = skips[i]
            if self.attention:
                skip = AttentionGate(max(wdt // 2, 1), dtype=self.dtype,
                                     name=f"att{i + 2}")(x, skip, train)
            x = jnp.concatenate([skip, x], axis=-1)
            x = self._block(wdt, name=f"dec{i + 2}")(x, train)

        logits = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                         name="head")(x)
        if self.return_features:
            return logits, bottleneck
        return logits


def u_net(out_channels: int = 1, **kw) -> UNet:
    return UNet(out_channels=out_channels, **kw)


def r2u_net(out_channels: int = 1, t: int = 2, **kw) -> UNet:
    return UNet(out_channels=out_channels, recurrent=True, t=t, **kw)


def att_u_net(out_channels: int = 1, **kw) -> UNet:
    return UNet(out_channels=out_channels, attention=True, **kw)


def r2att_u_net(out_channels: int = 1, t: int = 2, **kw) -> UNet:
    return UNet(out_channels=out_channels, recurrent=True, attention=True,
                t=t, **kw)
