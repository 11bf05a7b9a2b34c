"""3-D residual U-Net with deep supervision (reference ``models/res3dunet.py``).

Behavior contract (reference ``:6-208``):
  * 4 encoder stages (16/32/64/128 ch) of 3×3×3 conv + PReLU chains with a
    residual add of the stage input; stages 3/4 use growing dilations
    (2,4 / 3,4,5); stride-2 2×2×2 conv downsampling between stages;
    dropout 0.2 after each residual (train only).
  * Decoder: 256-ch bottleneck, ConvTranspose3d(2,2) upsampling, skip
    concat, conv chains with residual add of the upsampled input.
  * Deep supervision: 4 heads (map1..map4) at 1/8,1/4,1/2,1/1 scales, each
    1×1×1 conv → trilinear upsample to full size → channel softmax; returns
    all four (coarsest first, ``:210``).

TPU-first: NDHWC layout; trilinear upsample = ``jax.image.resize`` (linear,
half-pixel — torch align_corners=False); PReLU is an explicit per-channel
parameter. Volumes must have D,H,W divisible by 8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C), init 0.25)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha",
                       lambda k, s: jnp.full(s, 0.25), (x.shape[-1],))
        # cast the (fp32) parameter to the activation dtype so a bf16
        # compute chain is not silently promoted back to fp32
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class ConvPReLU(nn.Module):
    features: int
    dilation: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        x = nn.Conv(self.features, (3, 3, 3),
                    padding=((d, d),) * 3, kernel_dilation=(d, d, d),
                    dtype=self.dtype, name="conv")(x)
        return PReLU(name="prelu")(x)


class DownConv(nn.Module):
    features: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (2, 2, 2), strides=(2, 2, 2),
                    padding="VALID", dtype=self.dtype, name="conv")(x)
        return PReLU(name="prelu")(x)


class UpConv(nn.Module):
    features: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                             padding="VALID", dtype=self.dtype,
                             name="conv")(x)
        return PReLU(name="prelu")(x)


def _upsample_trilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    if factor == 1:
        return x
    b, d, h, w, c = x.shape
    return jax.image.resize(
        x, (b, d * factor, h * factor, w * factor, c), method="linear")


class ResUNet3D(nn.Module):
    """Input (B, D, H, W, C_in) → 4 softmax maps (B, D, H, W, out_channels).

    return_logits=True skips the channel softmax (the trainable registry
    adapter feeds BCE-with-logits, the repo's zoo loss contract);
    return_features=True additionally returns the 1/8-scale bottleneck
    (post-dec1 chain) as ``((o1, o2, o3, o4), feat)`` — the cycle-feature
    tap (the reference never wires this model to training, res3dunet.py:210
    just returns the maps, so the tap is this repo's train contract)."""

    out_channels: int = 2
    widths: tuple = (16, 32, 64, 128, 256)
    drop_rate: float = 0.2
    return_logits: bool = False
    return_features: bool = False
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = x.astype(self.dtype)  # residual adds must not re-promote
        w16, w32, w64, w128, w256 = self.widths
        drop = nn.Dropout(self.drop_rate, deterministic=not train)

        def chain(y, feats, dilations, name):
            out = y
            for i, (f, d) in enumerate(zip(feats, dilations)):
                out = ConvPReLU(f, d, dtype=self.dtype,
                                name=f"{name}_c{i}")(out)
            return out

        # encoder (residual add broadcasts the input's channels, as torch does)
        lr1 = chain(x, (w16, w16), (1, 1), "enc1") + x
        sr1 = DownConv(w32, dtype=self.dtype, name="down1")(lr1)
        lr2 = drop(chain(sr1, (w32,) * 3, (1, 1, 1), "enc2") + sr1)
        sr2 = DownConv(w64, dtype=self.dtype, name="down2")(lr2)
        lr3 = drop(chain(sr2, (w64,) * 3, (1, 2, 4), "enc3") + sr2)
        sr3 = DownConv(w128, dtype=self.dtype, name="down3")(lr3)
        lr4 = drop(chain(sr3, (w128,) * 3, (3, 4, 5), "enc4") + sr3)
        sr4 = ConvPReLU(w256, dtype=self.dtype, name="down4")(lr4)

        act = (lambda y: y) if self.return_logits else (
            lambda y: nn.softmax(y, -1))

        out = drop(chain(lr4, (w256,) * 3, (1, 1, 1), "dec1") + sr4)
        bottleneck = out
        o1 = act(_upsample_trilinear(
            nn.Conv(self.out_channels, (1, 1, 1),
                    dtype=self.dtype, name="map1")(out), 8))

        sr6 = UpConv(w128, dtype=self.dtype, name="up2")(out)
        out = drop(chain(jnp.concatenate([sr6, lr3], -1),
                         (w128,) * 3, (1, 1, 1), "dec2") + sr6)
        o2 = act(_upsample_trilinear(
            nn.Conv(self.out_channels, (1, 1, 1),
                    dtype=self.dtype, name="map2")(out), 4))

        sr7 = UpConv(w64, dtype=self.dtype, name="up3")(out)
        out = drop(chain(jnp.concatenate([sr7, lr2], -1),
                         (w64,) * 3, (1, 1, 1), "dec3") + sr7)
        o3 = act(_upsample_trilinear(
            nn.Conv(self.out_channels, (1, 1, 1),
                    dtype=self.dtype, name="map3")(out), 2))

        sr8 = UpConv(w32, dtype=self.dtype, name="up4")(out)
        out = chain(jnp.concatenate([sr8, lr1], -1),
                    (w32,) * 2, (1, 1), "dec4") + sr8
        o4 = act(nn.Conv(self.out_channels, (1, 1, 1),
                 dtype=self.dtype, name="map4")(out))

        if self.return_features:
            return (o1, o2, o3, o4), bottleneck
        return o1, o2, o3, o4
