"""Legacy research variants (reference ``models/ours.py`` model3..model21).

The reference carries ~15 numbered ablation models that all follow one
template — per-view (or shared) ResNet-50-IEKD backbone → a fusion mechanism
at f4 (or at several stages) → per-view (or shared) DeepLab classifier →
bilinear upsample — differing only in the fusion mechanism and sharing
pattern. One configurable module covers the whole family:

| reference class | fusion | stages | backbone | classifier |
|---|---|---|---|---|
| ``Mutiview_Model :142`` / ``model6 :466`` / ``model7 :509`` | none | — | per-view | per-view |
| ``model3 :386`` / ``model8 :640`` / ``model12 :719`` | channel_transformer | (4,) | per-view | per-view |
| ``model_CPS :557`` | channel_transformer twin (CPS) | (4,) | 2× per-view | per-view |
| ``model18 :919`` | tpavi | (4,) | per-view | SHARED |
| ``model19 :976`` | tpavi | (4,) | per-view | per-view |
| ``MLP_fusion :1044`` | mlp_concat (1×1 conv on channel-concat) | (4,) | per-view | per-view |
| ``model20 :1109`` | tpavi | (1,2,3,4) | per-view | per-view |
| ``model21 :1193`` / ``model21_for_specific_view :1268`` | decouple_tpavi | (4,) | SHARED | SHARED |
| ``concat_fusion :103`` / ``MLP :124`` | spatial-concat Linear / per-map MLP | — | (building blocks, see SpatialConcatFusion / SpatialMLP) |

``decouple_tpavi`` (model21): per-view 1×1 conv+BN "consistent" and
"complementary" projections of f4; TPAVI over the complementary stack; the
fused complementary features are added back to the consistent ones.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from glfusion_tpu.config import ModelConfig
from glfusion_tpu.models.aspp import DeepLabHead
from glfusion_tpu.models.avs import ViewChannelTransformer
from glfusion_tpu.models.glfusion import _per_view
from glfusion_tpu.models.resnet import (
    IEKDStem,
    ResNetIEKD,
    ResNetStage,
    stage_plan,
)
from glfusion_tpu.models.tpavi import TPAVI
from glfusion_tpu.ops.resize import resize_bilinear

_BN = dict(epsilon=1e-5, momentum=0.9)


class SpatialConcatFusion(nn.Module):
    """concat_fusion (reference :103-122): concat views on the SPATIAL axis,
    Linear V·hw → hw per channel. x: (V, B, h, w, C) → (B, h, w, C)."""

    @nn.compact
    def __call__(self, x):
        v, b, h, w, c = x.shape
        tok = jnp.transpose(x, (1, 4, 0, 2, 3)).reshape(b, c, v * h * w)
        tok = nn.Dense(h * w, name="fc")(tok)
        return jnp.transpose(tok.reshape(b, c, h, w), (0, 2, 3, 1))


class SpatialMLP(nn.Module):
    """MLP (reference :124-140): Linear over the flattened spatial dim + ReLU."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tok = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c, h * w)
        tok = nn.relu(nn.Dense(h * w, name="fc")(tok))
        return jnp.transpose(tok.reshape(b, c, h, w), (0, 2, 3, 1))


class _SharedOrPerViewHead(nn.Module):
    shared: bool
    num_outputs: int
    cfg: ModelConfig

    @nn.compact
    def __call__(self, f, train: bool):  # f: (V, B, h, w, C)
        kw = dict(num_outputs=self.num_outputs,
                  channels=self.cfg.aspp_channels,
                  rates=tuple(self.cfg.aspp_rates),
                  dropout=self.cfg.aspp_dropout, dtype=self.cfg.dtype)
        if self.shared:
            head = DeepLabHead(**kw, name="head")
            v = f.shape[0]
            return jnp.stack([head(f[i], train) for i in range(v)])
        return _per_view(DeepLabHead)(**kw, name="head")(f, train)


class LegacyMultiviewSeg(nn.Module):
    """The model3..model21 family behind one config surface."""

    cfg: ModelConfig
    fusion: str = "none"  # none|channel_transformer|tpavi|mlp_concat|decouple_tpavi
    fusion_stages: Sequence[int] = (4,)
    shared_backbone: bool = False
    shared_classifier: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        cfg = self.cfg
        v, b, hh, ww, _ = x.shape
        multi_stage = self.fusion == "tpavi" and len(self.fusion_stages) > 1
        if not multi_stage and tuple(self.fusion_stages) != (4,):
            # only tpavi supports interleaved multi-stage fusion (model20);
            # every other family member fuses the final f4 — reject instead
            # of silently training a different model than configured
            raise ValueError(
                f"fusion_stages={tuple(self.fusion_stages)} is only "
                f"supported as multi-stage tpavi (model20); "
                f"fusion={self.fusion!r} fuses at stage 4 only — "
                f"use fusion_stages=(4,)")

        def fuse_tpavi(f, name):
            attn = TPAVI(dtype=cfg.dtype, name=name)
            return jnp.swapaxes(attn(jnp.swapaxes(f, 0, 1), train), 0, 1)

        def lift(mod_cls, name, **kw):
            """Per-view-stacked (vmapped params) or shared module over the
            leading view axis, returning a (x, train)->(V,...) callable."""
            if self.shared_backbone:
                mod = mod_cls(**kw, name=name)
                return lambda f, train: jnp.stack(
                    [mod(f[i], train) for i in range(v)])
            return _per_view(mod_cls)(**kw, name=name)

        if multi_stage:
            # model20 (reference ours.py:1175-1186): fusion is INTERLEAVED
            # with the backbone — the fused stage-k features feed stage k+1,
            # so earlier fusion blocks shape later features (and receive
            # gradient), unlike post-hoc fusion of collected taps.
            xk = lift(IEKDStem, "backbone_stem", stem_width=cfg.stem_width,
                      dtype=cfg.dtype)(x, train)
            f4 = None
            plan = stage_plan(cfg.block_sizes, cfg.widths, cfg.dilate_stages)
            for stage, (blocks, planes, stride, fdil, dil) in enumerate(plan):
                xk = lift(ResNetStage, f"backbone_layer{stage + 1}",
                          planes=planes, blocks=blocks, stride=stride,
                          first_dilation=fdil, dilation=dil,
                          expansion=cfg.expansion, dtype=cfg.dtype)(xk, train)
                if stage == len(plan) - 1:
                    f4 = xk  # pre-fusion layer4 (reference returns it)
                if (stage + 1) in self.fusion_stages:
                    xk = fuse_tpavi(xk, f"non_local{stage + 1}")
            mask = _SharedOrPerViewHead(
                self.shared_classifier, cfg.num_classes, cfg,
                name="classifier")(xk, train)
            mask = resize_bilinear(mask, (hh, ww))
            return {"mask": mask, "f4": f4, "f4_fusion": xk}

        bb_kw = dict(stem_width=cfg.stem_width,
                     block_sizes=tuple(cfg.block_sizes),
                     widths=tuple(cfg.widths), expansion=cfg.expansion,
                     dilate_stages=tuple(cfg.dilate_stages),
                     dtype=cfg.dtype)
        feats = lift(ResNetIEKD, "backbone", **bb_kw)(x, train)

        if self.fusion == "none":
            f4_fusion = feats
        elif self.fusion == "channel_transformer":
            f4_fusion = ViewChannelTransformer(
                dtype=cfg.dtype, name="attn4")(feats, train)
        elif self.fusion == "mlp_concat":
            # MLP_fusion: per-view 1×1 conv over the channel-concat of all
            # views' f4 (reference :1053-1056, :1090-1094)
            cat = jnp.concatenate([feats[i] for i in range(v)], axis=-1)
            cat = jnp.broadcast_to(cat[None], (v,) + cat.shape)
            from glfusion_tpu.models.glfusion import PointwiseConv
            f4_fusion = _per_view(PointwiseConv)(
                features=feats.shape[-1], dtype=cfg.dtype,
                name="fc")(cat, train)
        elif self.fusion == "tpavi":
            f4_fusion = fuse_tpavi(feats, "non_local")
        elif self.fusion == "decouple_tpavi":
            # model21: per-view consistent/complementary 1×1 conv + BN
            def proj(name):
                class _Proj(nn.Module):
                    dtype: str = "float32"

                    @nn.compact
                    def __call__(self, f, train: bool):
                        y = nn.Conv(f.shape[-1], (1, 1), dtype=self.dtype,
                                    name="conv")(f)
                        return nn.BatchNorm(
                            use_running_average=not train, name="bn",
                            dtype=self.dtype, **_BN)(y)
                return _per_view(_Proj)(dtype=cfg.dtype, name=name)

            consistent = proj("consistent_conv")(feats, train)
            complementary = proj("complementary_conv")(feats, train)
            f4_fusion = fuse_tpavi(complementary, "non_local") + consistent
        else:
            raise ValueError(f"unknown fusion {self.fusion!r}")

        mask = _SharedOrPerViewHead(self.shared_classifier, cfg.num_classes,
                                    cfg, name="classifier")(f4_fusion, train)
        mask = resize_bilinear(mask, (hh, ww))
        return {"mask": mask, "f4": feats, "f4_fusion": f4_fusion}
