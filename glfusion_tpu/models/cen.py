"""CEN — Channel-Exchange RefineNet-LightWeight baseline (reference ``models/CEN.py``).

Behavior contract:
  * N parallel modality streams share ALL conv weights (``ModuleParallel``,
    reference ``models/modules.py:19``) but keep per-stream BatchNorms
    (``BatchNorm2dParallel :28``).
  * ResNet Bottleneck stages exchange channels between streams after bn2:
    each stream keeps channels whose own |bn γ| ≥ threshold and takes the
    rest from the next stream in a ring (``Exchange :5`` hard-codes the
    2-stream mutual swap; the ring is identical at S=2 and extends it to
    the 3-view config — applied at ``CEN.py:176-177``).
  * RefineNet-LightWeight decoder: per-level 3×3 dim-reduction convs, RCU
    chains (relu→conv twice + residual, ``RCUBlock :89``), CRP chains
    (5×5 maxpool→conv accumulation, ``CRPBlock :67``), top-down bilinear
    (align_corners=True) merges, 3×3 classifier.
  * Streams are ensembled by a learned softmax ``alpha`` over DETACHED
    per-stream logits (``CEN.py:304-310``); returns per-stream logits list +
    the ensemble + alpha_soft.

TPU-first: streams are a leading axis (S, B, H, W, C). Shared convs fold
S into batch — one MXU matmul for all streams; per-stream BN is an
``nn.vmap`` with stacked params; Exchange is a vectorized ``jnp.where`` on
the stacked BN scales (no boolean indexing).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from glfusion_tpu.ops.pooling import max_pool_3x3_s2
from glfusion_tpu.ops.resize import resize_bilinear_ac

_BN = dict(epsilon=1e-5, momentum=0.9)


class SharedConv(nn.Module):
    """ModuleParallel(conv): one weight set over the stream axis."""

    features: int
    kernel: int = 3
    strides: int = 1
    use_bias: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):  # (S, B, H, W, C)
        s, b = x.shape[:2]
        p = self.kernel // 2
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides,) * 2,
                    padding=((p, p), (p, p)), use_bias=self.use_bias,
                    dtype=self.dtype,
                    name="conv")(x.reshape((s * b,) + x.shape[2:]))
        return y.reshape((s, b) + y.shape[1:])


class StreamBN(nn.Module):
    """BatchNorm2dParallel: per-stream BN with explicit stacked params.

    Written out (rather than nn.vmap over nn.BatchNorm) so the Exchange op
    can read the stacked γ directly via ``return_scale``.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool, return_scale: bool = False):
        s, c = x.shape[0], x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (s, c))
        bias = self.param("bias", nn.initializers.zeros, (s, c))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((s, c)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((s, c)))
        if train:
            # moments + running stats stay fp32 (flax BatchNorm convention)
            xf = x.astype(jnp.float32)
            axes = tuple(range(1, x.ndim - 1))  # reduce B, H, W per stream
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        dt = self.dtype
        shape = (s,) + (1,) * (x.ndim - 2) + (c,)
        y = (x.astype(dt) - mean.astype(dt).reshape(shape)) * jax.lax.rsqrt(
            var.astype(dt).reshape(shape) + jnp.asarray(self.epsilon, dt))
        y = y * scale.astype(dt).reshape(shape) + bias.astype(dt).reshape(shape)
        return (y, scale) if return_scale else y


def _exchange(x: jnp.ndarray, scales: jnp.ndarray,
              threshold: float) -> jnp.ndarray:
    """Channel exchange between S streams (reference modules.py:5-16).

    x: (S, B, H, W, C); scales: (S, C) stacked BN γ. Stream i keeps its own
    channel c when |γ_i[c]| ≥ t, else takes it from the NEXT stream in a
    ring ((i+1) % S). The reference hard-codes S=2 (mutual swap); the ring
    is its exact behavior at S=2 and the natural extension beyond (the
    3-view CLI config feeds S=3 — exchange must not silently vanish there).
    """
    keep = (jnp.abs(scales) >= threshold)[:, None, None, None, :]
    other = jnp.roll(x, -1, axis=0)
    return jnp.where(keep, x, other)


class CENBottleneck(nn.Module):
    """Shared-conv bottleneck with post-bn2 channel exchange (CEN.py:145-191)."""

    planes: int
    strides: int = 1
    bn_threshold: float = 2e-2
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)  # identity shortcut must not promote
        out_ch = self.planes * 4
        residual = x
        y = SharedConv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        y = StreamBN(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = SharedConv(self.planes, 3, strides=self.strides,
                       dtype=self.dtype, name="conv2")(y)
        y, scales = StreamBN(dtype=self.dtype,
                             name="bn2")(y, train, return_scale=True)
        if x.shape[0] > 1:  # single-stream: exchange is the identity
            y = _exchange(y, scales, self.bn_threshold)
        y = nn.relu(y)
        y = SharedConv(out_ch, 1, dtype=self.dtype, name="conv3")(y)
        y = StreamBN(dtype=self.dtype, name="bn3")(y, train)
        if self.strides != 1 or x.shape[-1] != out_ch:
            residual = SharedConv(out_ch, 1, strides=self.strides,
                                  dtype=self.dtype, name="down_conv")(x)
            residual = StreamBN(dtype=self.dtype,
                                name="down_bn")(residual, train)
        return nn.relu(y + residual)


class RCU(nn.Module):
    """Residual Conv Unit chain (reference RCUBlock, CEN.py:89-111)."""

    features: int
    num_blocks: int = 2
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i in range(self.num_blocks):
            residual = x
            x = SharedConv(self.features, 3, use_bias=True, dtype=self.dtype,
                           name=f"b{i}_conv0")(nn.relu(x))
            x = SharedConv(self.features, 3, use_bias=False,
                           dtype=self.dtype,
                           name=f"b{i}_conv1")(nn.relu(x))
            x = x + residual
        return x


class CRP(nn.Module):
    """Chained Residual Pooling (reference CRPBlock, CEN.py:67-85)."""

    features: int
    num_stages: int = 4
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        top = x
        for i in range(self.num_stages):
            s, b = top.shape[:2]
            flat = top.reshape((s * b,) + top.shape[2:])
            flat = nn.max_pool(flat, (5, 5), strides=(1, 1),
                               padding=((2, 2), (2, 2)))
            top = flat.reshape(top.shape)
            top = SharedConv(self.features, 3, dtype=self.dtype,
                             name=f"s{i}_conv")(top)
            x = x + top
        return x


class CENRefineNet(nn.Module):
    """refinenet-50/101/152 with channel exchange (reference CEN.py:193-336).

    Input (S, B, H, W, C_in) multi-stream images →
    (per-stream logits (S, B, H/4, W/4, classes), ensemble, alpha_soft).
    """

    num_classes: int = 5
    block_sizes: Sequence[int] = (3, 4, 6, 3)
    bn_threshold: float = 2e-2
    dropout: float = 0.5
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = x.shape[0]
        sb = s * x.shape[1]

        def flat_pool(t):
            f = t.reshape((sb,) + t.shape[2:])
            f = max_pool_3x3_s2(f)
            return f.reshape((s, t.shape[1]) + f.shape[1:])

        y = SharedConv(64, 7, strides=2, dtype=self.dtype, name="conv1")(x)
        y = StreamBN(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = flat_pool(y)

        feats = []
        planes = (64, 128, 256, 512)
        for li, (p, blocks) in enumerate(zip(planes, self.block_sizes)):
            stride = 1 if li == 0 else 2
            for b in range(blocks):
                y = CENBottleneck(p, strides=stride if b == 0 else 1,
                                  bn_threshold=self.bn_threshold,
                                  dtype=self.dtype,
                                  name=f"layer{li + 1}_b{b}")(y, train)
            feats.append(y)
        l1, l2, l3, l4 = feats

        drop = nn.Dropout(self.dropout, deterministic=not train)
        l4, l3 = drop(l4), drop(l3)

        def up_to(t, ref):
            # per-stream bilinear align_corners=True to ref's spatial size
            return jax.vmap(lambda a: resize_bilinear_ac(a, ref.shape[2:4]))(t)

        x4 = SharedConv(512, 3, dtype=self.dtype, name="outl1_dimred")(l4)
        x4 = RCU(512, 2, dtype=self.dtype, name="adapt1")(x4)
        x4 = nn.relu(x4)
        x4 = CRP(512, 4, dtype=self.dtype, name="crp1")(x4)
        x4 = RCU(512, 3, dtype=self.dtype, name="rcu1")(x4)
        x4 = SharedConv(256, 3, dtype=self.dtype, name="varout1")(x4)
        x4 = up_to(x4, l3)

        x3 = SharedConv(256, 3, dtype=self.dtype, name="outl2_dimred")(l3)
        x3 = RCU(256, 2, dtype=self.dtype, name="adapt2")(x3)
        x3 = SharedConv(256, 3, dtype=self.dtype, name="adapt2_varout")(x3)
        x3 = nn.relu(x3 + x4)
        x3 = CRP(256, 4, dtype=self.dtype, name="crp2")(x3)
        x3 = RCU(256, 3, dtype=self.dtype, name="rcu2")(x3)
        x3 = SharedConv(256, 3, dtype=self.dtype, name="varout2")(x3)
        x3 = up_to(x3, l2)

        x2 = SharedConv(256, 3, dtype=self.dtype, name="outl3_dimred")(l2)
        x2 = RCU(256, 2, dtype=self.dtype, name="adapt3")(x2)
        x2 = SharedConv(256, 3, dtype=self.dtype, name="adapt3_varout")(x2)
        x2 = nn.relu(x2 + x3)
        x2 = CRP(256, 4, dtype=self.dtype, name="crp3")(x2)
        x2 = RCU(256, 3, dtype=self.dtype, name="rcu3")(x2)
        x2 = SharedConv(256, 3, dtype=self.dtype, name="varout3")(x2)
        x2 = up_to(x2, l1)

        x1 = SharedConv(256, 3, dtype=self.dtype, name="outl4_dimred")(l1)
        x1 = RCU(256, 2, dtype=self.dtype, name="adapt4")(x1)
        x1 = SharedConv(256, 3, dtype=self.dtype, name="adapt4_varout")(x1)
        x1 = nn.relu(x1 + x2)
        x1 = CRP(256, 4, dtype=self.dtype, name="crp4")(x1)
        x1 = RCU(256, 3, dtype=self.dtype, name="rcu4")(x1)
        x1 = drop(x1)

        logits = SharedConv(self.num_classes, 3, use_bias=True,
                            dtype=self.dtype, name="clf")(x1)  # (S, B, h, w, classes)

        alpha = self.param("alpha", nn.initializers.ones, (s,))
        alpha_soft = nn.softmax(alpha)
        ens = jnp.einsum("s,s...->...", alpha_soft,
                         jax.lax.stop_gradient(logits))
        return logits, ens, alpha_soft
