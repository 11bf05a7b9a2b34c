"""AVS-derived encoder-decoder baselines (reference ``models/ResNet_AVSModel.py``
+ the 2-branch backbone in ``models/resnet.py``).

Behavior contract:
  * ``B2_ResNet`` (reference ``resnet.py:82-140``): ImageNet-style ResNet-50
    — 3-ch 7×7 s2 stem, maxpool, shared layer1/2, then TWO independent
    layer3/layer4 forks. Echo inputs are 1-ch repeated to 3
    (``ResNet_AVSModel.py:497``).
  * ``Classifier_Module`` (``:11-24``): sum of four dilated 3×3 convs
    (rates 3/6/12/18) projecting a stage to `channel`.
  * RefineNet-style decoder: ``ResidualConvUnit`` (``:42-72``) and
    ``FeatureFusionBlock`` (``:75-119``) — add skip through an RCU, two
    convs, bilinear (align_corners=True) upsample to the next stage's
    resolution; output head conv→×2 upsample→conv→ReLU→1×1 to 5 classes
    (``:185-191``).
  * ``Pred_endecoder`` (``:158``): main view + other view through two
    B2_ResNets; per-stage cross-view TPAVI (keys from the other view —
    implemented by intent, the shipped audio-path reshape cannot run on
    echo shapes); decode main view only.
  * ``transformer`` (``:382-413``): view-concat CHANNEL-token attention —
    tokens are the C·V channels, token dim is h·w; BN residual + LayerNorm
    over the per-view re-split — used per stage by ``AVS_Transfusion :416``.
  * ``AVS_baseline :791``: per-view independent decode, no fusion,
    identity-width Classifier_Modules (256/512/1024/2048).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from glfusion_tpu.models.tpavi import TPAVI
from glfusion_tpu.ops.pooling import max_pool_3x3_s2
from glfusion_tpu.ops.resize import resize_bilinear, resize_bilinear_ac

_BN = dict(epsilon=1e-5, momentum=0.9)


class _Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)  # identity shortcut must not promote
        out_ch = self.planes * 4
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=self.dtype, **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.strides,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2",
                         dtype=self.dtype, **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn3",
                         dtype=self.dtype, **_BN)(y)
        if self.strides != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.strides,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="down_bn", dtype=self.dtype,
                                    **_BN)(residual)
        return nn.relu(y + residual)


class B2ResNet(nn.Module):
    """2-branch ResNet-50: shared stem/layer1/2, forked layer3/4.

    Returns the per-stage taps (x1, x2, x3_1, x4_1, x3_2, x4_2) so callers
    can use either branch's features (reference resnet.py:128-140 returns
    only the two layer4 outputs; the AVS decoder additionally taps
    layer1/2/3_1, ResNet_AVSModel.py:245-258).
    """

    widths: Sequence[int] = (64, 128, 256, 512)
    blocks: Sequence[int] = (3, 4, 6, 3)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        w = self.widths
        x = nn.Conv(w[0], (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=self.dtype, **_BN)(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        for b in range(self.blocks[0]):
            x = _Bottleneck(w[0], dtype=self.dtype, name=f"layer1_b{b}")(x, train)
        x1 = x
        for b in range(self.blocks[1]):
            x = _Bottleneck(w[1], strides=2 if b == 0 else 1,
                            dtype=self.dtype, name=f"layer2_b{b}")(x, train)
        x2 = x
        y1, y2 = x, x
        for b in range(self.blocks[2]):
            y1 = _Bottleneck(w[2], strides=2 if b == 0 else 1,
                             dtype=self.dtype, name=f"layer3_1_b{b}")(y1, train)
        x3_1 = y1
        for b in range(self.blocks[3]):
            y1 = _Bottleneck(w[3], strides=2 if b == 0 else 1,
                             dtype=self.dtype, name=f"layer4_1_b{b}")(y1, train)
        for b in range(self.blocks[2]):
            y2 = _Bottleneck(w[2], strides=2 if b == 0 else 1,
                             dtype=self.dtype, name=f"layer3_2_b{b}")(y2, train)
        x3_2 = y2
        for b in range(self.blocks[3]):
            y2 = _Bottleneck(w[3], strides=2 if b == 0 else 1,
                             dtype=self.dtype, name=f"layer4_2_b{b}")(y2, train)
        return x1, x2, x3_1, y1, x3_2, y2


class ClassifierModule(nn.Module):
    """Sum of dilated 3×3 convs (reference ResNet_AVSModel.py:11-24)."""

    features: int
    rates: Sequence[int] = (3, 6, 12, 18)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        out = 0.0
        for i, r in enumerate(self.rates):
            out = out + nn.Conv(self.features, (3, 3),
                                padding=((r, r), (r, r)),
                                kernel_dilation=(r, r), use_bias=True,
                                dtype=self.dtype, name=f"conv{i}")(x)
        return out


class ResidualConvUnit(nn.Module):
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        c = x.shape[-1]
        y = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv1")(nn.relu(x))
        y = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(nn.relu(y))
        return y + x


class FeatureFusionBlock(nn.Module):
    """RefineNet fusion: (+skip via RCU) → RCU → convs → upsample to target."""

    out_features: int
    target_hw: tuple
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x.astype(self.dtype) + ResidualConvUnit(
                dtype=self.dtype, name="rcu1")(skip)
        x = ResidualConvUnit(dtype=self.dtype, name="rcu2")(x)
        x = nn.relu(x)
        x = nn.Conv(x.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(x)
        return resize_bilinear_ac(x, self.target_hw)


class OutputHead(nn.Module):
    """conv→×2 bilinear→conv→ReLU→1×1 to num_classes (reference :185-191)."""

    num_classes: int = 5
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv1")(x)
        h, w = x.shape[-3] * 2, x.shape[-2] * 2
        x = resize_bilinear(x, (h, w))
        x = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="out")(x)


class ViewChannelTransformer(nn.Module):
    """Reference ``transformer`` (:382-413): view-concat channel-token
    self-attention. x: (V, B, h, w, C) → same."""

    heads: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        v, b, h, w, c = x.shape
        n_embd = h * w
        # tokens: (B, V·C, h·w)
        tok = jnp.transpose(x, (1, 0, 4, 2, 3)).reshape(b, v * c, n_embd)
        tok = tok.astype(self.dtype)  # token residual must not promote
        q = nn.Dense(n_embd, dtype=self.dtype, name="query")(tok)
        k = nn.Dense(n_embd, dtype=self.dtype, name="key")(tok)
        val = nn.Dense(n_embd, dtype=self.dtype, name="value")(tok)
        att = nn.softmax(
            jnp.einsum("btd,bsd->bts", q, k)
            / jnp.sqrt(n_embd).astype(self.dtype), -1)
        y = jnp.einsum("bts,bsd->btd", att, val)
        y = nn.Dense(n_embd, dtype=self.dtype, name="proj")(y)
        # BN over the V·C "channel" axis, residual, LayerNorm over channels
        y = nn.BatchNorm(use_running_average=not train, axis=1,
                         dtype=self.dtype, name="bn", **_BN)(y)
        tok = tok + y
        out = tok.reshape(b, v, c, h, w)
        out = jnp.transpose(out, (0, 3, 4, 2, 1))  # (B, h, w, C, V)
        out = nn.LayerNorm(
            epsilon=1e-5, reduction_axes=(-2, -1), dtype=self.dtype,
            name="norm")(out)
        return jnp.transpose(out, (4, 0, 1, 2, 3))  # (V, B, h, w, C)


class PredEndecoder(nn.Module):
    """Main-view + other-view cross-attention segmenter (reference :158-340).

    Inputs: main (B, H, W, 1), other (B, H, W, 1). Output (B, ~H, ~W, 5).
    """

    channel: int = 256
    tpavi_stages: Sequence[int] = (0, 1, 2, 3)
    num_classes: int = 5
    widths: Sequence[int] = (64, 128, 256, 512)
    blocks: Sequence[int] = (3, 4, 6, 3)
    # also return the deepest (post-fusion) stage features — the registry
    # adapter pools them for the cycle loss (the reference never trains this
    # family, so the feature tap is the TPU-side training contract)
    return_features: bool = False
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, main, other, train: bool = False):
        main = jnp.repeat(main, 3, axis=-1)
        other = jnp.repeat(other, 3, axis=-1)
        bb1 = B2ResNet(tuple(self.widths), tuple(self.blocks),
                       dtype=self.dtype, name="resnet")
        bb2 = B2ResNet(tuple(self.widths), tuple(self.blocks),
                       dtype=self.dtype, name="resnet2")
        x1, x2, x3, x4, _, _ = bb1(main, train)
        o1, o2, o3, o4, _, _ = bb2(other, train)
        feats = [x1, x2, x3, x4]
        ofeats = [o1, o2, o3, o4]
        heads = [ClassifierModule(self.channel, dtype=self.dtype,
                                  name=f"conv{i + 1}")
                 for i in range(4)]
        fm = [heads[i](feats[i]) for i in range(4)]
        om = [heads[i](ofeats[i]) for i in range(4)]

        for i in self.tpavi_stages:
            attn = TPAVI(dtype=self.dtype, name=f"tpavi_b{i + 1}")
            q = fm[i][:, None]  # (B, 1, h, w, C)
            kv = om[i][:, None]
            fm[i] = attn(q, train, kv)[:, 0]

        t4 = fm[2].shape[1:3]
        t3 = fm[1].shape[1:3]
        t2 = fm[0].shape[1:3]
        t1 = (fm[0].shape[1] * 2, fm[0].shape[2] * 2)
        y = FeatureFusionBlock(self.channel, t4, dtype=self.dtype,
                               name="path4")(fm[3])
        y = FeatureFusionBlock(self.channel, t3, dtype=self.dtype,
                               name="path3")(y, fm[2])
        y = FeatureFusionBlock(self.channel, t2, dtype=self.dtype,
                               name="path2")(y, fm[1])
        y = FeatureFusionBlock(self.channel, t1, dtype=self.dtype,
                               name="path1")(y, fm[0])
        out = OutputHead(self.num_classes, dtype=self.dtype,
                         name="output_conv")(y)
        if self.return_features:
            return out, fm[3]
        return out


class AVSTransfusion(nn.Module):
    """Per-view encoder + per-stage cross-view fusion + per-view decode.

    fusion='transformer', per_view_params=False → AVS_Transfusion
    (reference :416-603: ONE shared B2-ResNet applied per view, per-stage
    channel-transformer fusion).
    fusion='tpavi', per_view_params=True → model17 (reference :603-790:
    per-view B2-ResNets + per-stage multi-view TPAVI dot attention).

    Input (V, B, H, W, 1) → (V, B, ~H, ~W, 5).
    """

    channel: int = 256
    fuse_stages: Sequence[int] = (0, 1, 2, 3)
    num_classes: int = 5
    widths: Sequence[int] = (64, 128, 256, 512)
    blocks: Sequence[int] = (3, 4, 6, 3)
    fusion: str = "transformer"  # 'transformer' | 'tpavi'
    per_view_params: bool = False
    # also return the deepest (post-fusion) stage features (V, B, h, w, C)
    # for the registry adapter's cycle-loss pooling
    return_features: bool = False
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = x.shape[0]
        x = jnp.repeat(x, 3, axis=-1)
        if self.per_view_params:
            bbs = [B2ResNet(tuple(self.widths), tuple(self.blocks),
                            dtype=self.dtype,
                            name=f"resnet_{vi}") for vi in range(v)]
        else:
            shared = B2ResNet(tuple(self.widths), tuple(self.blocks),
                              dtype=self.dtype, name="resnet")
            bbs = [shared] * v
        heads = [ClassifierModule(self.channel, dtype=self.dtype,
                                  name=f"conv{i + 1}")
                 for i in range(4)]

        fm = [[] for _ in range(4)]
        for vi in range(v):
            x1, x2, x3, x4, _, _ = bbs[vi](x[vi], train)
            taps = [x1, x2, x3, x4]
            for i in range(4):
                fm[i].append(heads[i](taps[i]))
        fm = [jnp.stack(f) for f in fm]  # each (V, B, h, w, C)

        for i in self.fuse_stages:
            if self.fusion == "tpavi":
                attn = TPAVI(dtype=self.dtype, name=f"tpavi_b{i + 1}")
                fm[i] = jnp.swapaxes(
                    attn(jnp.swapaxes(fm[i], 0, 1), train), 0, 1)
            else:
                fm[i] = ViewChannelTransformer(
                    dtype=self.dtype, name=f"attn{i + 1}")(fm[i], train)

        t4 = fm[2].shape[2:4]
        t3 = fm[1].shape[2:4]
        t2 = fm[0].shape[2:4]
        t1 = (fm[0].shape[2] * 2, fm[0].shape[3] * 2)
        paths = [FeatureFusionBlock(self.channel, t4, dtype=self.dtype,
                                    name="path4"),
                 FeatureFusionBlock(self.channel, t3, dtype=self.dtype,
                                    name="path3"),
                 FeatureFusionBlock(self.channel, t2, dtype=self.dtype,
                                    name="path2"),
                 FeatureFusionBlock(self.channel, t1, dtype=self.dtype,
                                    name="path1")]
        head = OutputHead(self.num_classes, dtype=self.dtype,
                          name="output_conv")
        outs = []
        for vi in range(v):
            y = paths[0](fm[3][vi])
            y = paths[1](y, fm[2][vi])
            y = paths[2](y, fm[1][vi])
            y = paths[3](y, fm[0][vi])
            outs.append(head(y))
        out = jnp.stack(outs)
        if self.return_features:
            return out, fm[3]
        return out


class AVSBaseline(nn.Module):
    """Per-view independent decode, no cross-view fusion (reference
    AVS_baseline :791-955): ONE shared B2-ResNet (branch-1 taps,
    :886-897), and — unlike Transfusion's uniform-width decoder —
    IDENTITY-width Classifier_Modules (conv_i: ch_i→ch_i for
    ch = 256/512/1024/2048, :804-807) feeding a NARROWING
    FeatureFusionBlock chain 2048→1024→512→256→256 (:809-812).
    Input (V, B, H, W, 1) → (V, B, ~H, ~W, num_classes)."""

    num_classes: int = 5
    widths: Sequence[int] = (64, 128, 256, 512)
    blocks: Sequence[int] = (3, 4, 6, 3)
    # deepest-stage features (V, B, h, w, C) for the registry adapter's
    # cycle-loss pooling (the reference never trains this family)
    return_features: bool = False
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = x.shape[0]
        x = jnp.repeat(x, 3, axis=-1)
        shared = B2ResNet(tuple(self.widths), tuple(self.blocks),
                          dtype=self.dtype, name="resnet")
        ch = [wd * 4 for wd in self.widths]  # bottleneck expansion ×4
        heads = [ClassifierModule(ch[i], dtype=self.dtype,
                                  name=f"conv{i + 1}")
                 for i in range(4)]
        fm = [[] for _ in range(4)]
        for vi in range(v):
            x1, x2, x3, x4, _, _ = shared(x[vi], train)
            taps = [x1, x2, x3, x4]
            for i in range(4):
                fm[i].append(heads[i](taps[i]))
        fm = [jnp.stack(f) for f in fm]  # each (V, B, h, w, ch[i])

        t4 = fm[2].shape[2:4]
        t3 = fm[1].shape[2:4]
        t2 = fm[0].shape[2:4]
        t1 = (fm[0].shape[2] * 2, fm[0].shape[3] * 2)
        # skip-add requires path_i's output width == stage_(i-1)'s head
        # width, which the narrowing chain guarantees (:915-918)
        paths = [FeatureFusionBlock(ch[2], t4, dtype=self.dtype,
                                    name="path4"),
                 FeatureFusionBlock(ch[1], t3, dtype=self.dtype,
                                    name="path3"),
                 FeatureFusionBlock(ch[0], t2, dtype=self.dtype,
                                    name="path2"),
                 FeatureFusionBlock(ch[0], t1, dtype=self.dtype,
                                    name="path1")]
        head = OutputHead(self.num_classes, dtype=self.dtype,
                          name="output_conv")
        outs = []
        for vi in range(v):
            y = paths[0](fm[3][vi])
            y = paths[1](y, fm[2][vi])
            y = paths[2](y, fm[1][vi])
            y = paths[3](y, fm[0][vi])
            outs.append(head(y))
        out = jnp.stack(outs)
        if self.return_features:
            return out, fm[3]
        return out
