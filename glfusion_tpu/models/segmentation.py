"""Single-view DeepLab segmenter factory (reference ``models/segmentation.py``
ctors + the ``_SimpleSegmentationModel*`` bodies in ``models/_utils.py``).

Variant contracts:
  * ``deeplabv3_resnet50`` (reference ``segmentation.py:463``, body
    ``_utils.py:9-46``): 3-ch torchvision-style model PLUS a contrastive
    center head — global avg-pool of f4 → Linear 2048→2048 → ReLU →
    Linear→128 → L2-normalize. Returns {out, ctr_feat, feat_mid}.
  * ``deeplabv3_resnet50_iekd`` (``segmentation.py:484``, body
    ``_utils.py:180-233``): the 1-ch stride-1-stem variant used by
    GL-Fusion; exposes layer taps {out, x_layerbs, x_layer1, x_layer4,
    maskfeat(56² logits)}.
  * ``deeplabv3_resnet50_iekd_project`` (``segmentation.py:503``, body
    ``_utils.py:237-292``): iekd taps + the 128-d normalized projection in
    the ``x_layer4`` slot.
  * ``deeplabv3_resnet50_iekd_maxmod`` (``segmentation.py:547``, body
    ``_utils.py:294-344``): stem→layer1→maxpool order swap is NOT
    reproduced (it contradicts the ResNet topology contract used by every
    checkpoint); the distinguishing output — a 3-conv LeakyReLU ``coder``
    head on layer1 — is (``xtest_layer1code``).
  * ``MultiFrameSegmenter`` (``segmentation.py:524`` + ``_utils.py:55-120``
    ``_mltfrm``): the reference frame + 3 support frames through one shared
    backbone; per-pair dot-product attention over flattened f4 tokens with a
    softmax over the WHOLE L·K matrix (faithful to the reference's
    ``softmax(x.view(B, -1))``), channel-concat of the reference + 3
    attended maps, 1×1 reduction, classifier.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from glfusion_tpu.models.aspp import DeepLabHead
from glfusion_tpu.models.resnet import ResNetIEKD
from glfusion_tpu.ops.resize import resize_bilinear


class DeepLabV3Single(nn.Module):
    """Backbone + head + optional aux outputs behind one switchboard."""

    num_classes: int = 5
    in_channels: int = 1           # iekd: 1-ch stride-1 stem
    variant: str = "iekd"          # 'plain' | 'iekd' | 'project' | 'maxmod'
    stem_width: int = 64
    block_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    aspp_rates: Sequence[int] = (12, 24, 36)
    aspp_channels: int = 256
    ctr_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        hh, ww = x.shape[-3], x.shape[-2]
        taps = ResNetIEKD(
            stem_width=self.stem_width,
            block_sizes=tuple(self.block_sizes),
            widths=tuple(self.widths),
            return_taps=True,
            name="backbone")(x, train)
        f4 = taps["layer4"]
        logits = DeepLabHead(num_outputs=self.num_classes,
                             channels=self.aspp_channels,
                             rates=tuple(self.aspp_rates),
                             name="classifier")(f4, train)
        out: Dict[str, Any] = {
            "out": resize_bilinear(logits, (hh, ww)),
        }
        if self.variant == "plain":
            pooled = jnp.mean(f4, axis=(-3, -2))
            ctr = nn.Dense(f4.shape[-1], name="ctr_fc1")(pooled)
            ctr = nn.Dense(self.ctr_dim, name="ctr_fc2")(nn.relu(ctr))
            ctr = ctr / jnp.linalg.norm(ctr, axis=-1, keepdims=True)
            out["ctr_feat"] = ctr
            out["feat_mid"] = f4
        elif self.variant == "iekd":
            out["x_layerbs"] = taps["stem"]
            out["x_layer1"] = taps["layer1"]
            out["x_layer4"] = f4
            out["maskfeat"] = resize_bilinear(logits, (56, 56))
        elif self.variant == "project":
            pooled = jnp.mean(f4, axis=(-3, -2))
            ctr = nn.Dense(f4.shape[-1], name="cntr_fc1")(pooled)
            ctr = nn.Dense(self.ctr_dim, name="cntr_fc2")(nn.relu(ctr))
            ctr = ctr / jnp.linalg.norm(ctr, axis=-1, keepdims=True)
            out["x_layerbs"] = taps["stem"]
            out["x_layer1"] = taps["layer1"]
            out["x_layer4"] = ctr[..., None, None]
        elif self.variant == "maxmod":
            code = taps["layer1"]
            for i, ch in enumerate((256, 64, 64)):
                code = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                               use_bias=False, name=f"coder{i}")(code)
                code = nn.leaky_relu(code, 0.1)
            out["xtest_layer1code"] = code
        else:
            raise ValueError(f"unknown variant {self.variant!r}")
        return out


def deeplabv3_resnet50(num_classes: int = 21, **kw) -> DeepLabV3Single:
    return DeepLabV3Single(num_classes=num_classes, in_channels=3,
                           variant="plain", **kw)


def deeplabv3_resnet50_iekd(num_classes: int = 5, **kw) -> DeepLabV3Single:
    return DeepLabV3Single(num_classes=num_classes, variant="iekd", **kw)


def deeplabv3_resnet50_iekd_project(num_classes: int = 5,
                                    **kw) -> DeepLabV3Single:
    return DeepLabV3Single(num_classes=num_classes, variant="project", **kw)


def deeplabv3_resnet50_iekd_maxmod(num_classes: int = 5,
                                   **kw) -> DeepLabV3Single:
    return DeepLabV3Single(num_classes=num_classes, variant="maxmod", **kw)


class MultiFrameSegmenter(nn.Module):
    """_mltfrm: support-frame attention aggregation (reference _utils.py:55-120).

    ``spatial_attention=True`` selects the ``_mltfrm_spatatt`` body
    (reference ``_utils.py:121-178``): instead of a token-pair attention
    matrix, each support frame contributes one SCALAR spatial map —
    channel-sum of (reference ⊙ support) features, softmax over the whole
    h·w grid — which reweights the reference features. Same concat → 1×1
    reduction → classifier tail as the token variant.
    """

    num_classes: int = 5
    stem_width: int = 64
    block_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    aspp_rates: Sequence[int] = (12, 24, 36)
    aspp_channels: int = 256
    spatial_attention: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, supports: Sequence[jnp.ndarray],
                 train: bool = False) -> Dict[str, Any]:
        hh, ww = x.shape[-3], x.shape[-2]
        backbone = ResNetIEKD(
            stem_width=self.stem_width,
            block_sizes=tuple(self.block_sizes),
            widths=tuple(self.widths),
            name="backbone")
        f = backbone(x, train)                       # (B, h, w, C)
        b, h, w, c = f.shape
        ft = f.reshape(b, h * w, c)

        def attend(sup):
            fs = backbone(sup, train).reshape(b, h * w, c)
            dot = jnp.einsum("blc,bkc->blk", ft, fs)
            # softmax over the WHOLE L·K matrix (reference _utils.py:91-93)
            att = nn.softmax(dot.reshape(b, -1), axis=-1).reshape(dot.shape)
            return jnp.einsum("blc,blk->bkc", ft, att).reshape(b, h, w, c)

        def attend_spatial(sup):
            # _mltfrm_spatatt (_utils.py:149-163): channel-sum similarity →
            # softmax over the whole spatial grid → scalar map ⊙ reference
            fs = backbone(sup, train)                # (B, h, w, C)
            dot = jnp.sum(f * fs, axis=-1)           # (B, h, w)
            att = nn.softmax(dot.reshape(b, -1), axis=-1).reshape(b, h, w, 1)
            return att * f

        attended = [attend_spatial(s) if self.spatial_attention else attend(s)
                    for s in supports]
        cat = jnp.concatenate([f] + attended, axis=-1)
        red = nn.Conv(c, (1, 1), use_bias=False, name="mlp_red")(cat)
        logits = DeepLabHead(num_outputs=self.num_classes,
                             channels=self.aspp_channels,
                             rates=tuple(self.aspp_rates),
                             name="classifier")(red, train)
        return {"out": resize_bilinear(logits, (hh, ww))}


def deeplabv3_resnet50_mltfrm(num_classes: int = 5,
                              **kw) -> MultiFrameSegmenter:
    """Reference ctor ``segmentation.py:524`` → ``_utils.py:55`` body."""
    return MultiFrameSegmenter(num_classes=num_classes, **kw)


def deeplabv3_resnet50_mltfrm_spatatt(num_classes: int = 5,
                                      **kw) -> MultiFrameSegmenter:
    """The ``_mltfrm_spatatt`` body (reference ``_utils.py:121-178``; the
    comment at ``_utils.py:56-57`` records it as the original 1303_segmltfrm
    configuration)."""
    return MultiFrameSegmenter(num_classes=num_classes,
                               spatial_attention=True, **kw)
