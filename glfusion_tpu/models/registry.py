"""Trainable-model registry: CLI ``--model`` names → Trainer-contract modules.

The reference can only train ``Global_and_Local`` (its Trainer hard-codes the
class, reference ``main.py:150``); every baseline in ``models/`` is
unreachable from its entry point. Here each segmentation family is adapted
to ONE contract so the same jitted train/eval steps drive the whole zoo:

    module(x: (V, B, H, W, 1), train) -> {
        "mask":      (V, B, H, W, num_classes) logits,
        "mask_bb":   same (backbone-only logits where the arch has them),
        "f4_global": (V, B|T, h, w, C) features for the cycle loss,
        "f4_local":  same,
    }

Regression models (``--mode reg-train``) are registered with their input
adapter: the RegressionClipLoader's (V, B, H, W, T) device clips → each
architecture's native convention.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from glfusion_tpu.config import ModelConfig
from glfusion_tpu.models.glfusion import GlobalAndLocal, GlobalAndLocalCPS, _per_view
from glfusion_tpu.models.multiview_unet import MultiviewUNet
from glfusion_tpu.models.utnet import UTNet
from glfusion_tpu.ops.resize import resize_bilinear


class _MultiviewUNetAdapter(nn.Module):
    """baseline_unet / multiview_unet (reference ours.py:2416/:2518) with
    the bottleneck as cycle features — exactly what the reference's train
    loop pools (baseline_unet returns ``(d1, None, None, x5)``)."""

    cfg: ModelConfig
    fuse: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        # stem_width 64 reproduces the reference widths (64..1024)
        widths = tuple(self.cfg.stem_width * (2 ** i) for i in range(5))
        out = MultiviewUNet(num_classes=self.cfg.num_classes, widths=widths,
                            fuse=self.fuse, dtype=self.cfg.dtype,
                            name="net")(x, train)
        return {"mask": out["mask"], "mask_bb": out["mask"],
                "f4_global": out["bottleneck"], "f4_local": out["bottleneck"]}


class _UTNetAdapter(nn.Module):
    """Per-view UTNet (reference utnet.py:11) under the multi-view contract;
    bottleneck (deepest encoder stage) serves as cycle features."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        # the attention's relative-position bias needs every transformer
        # stage's grid divisible by reduce_size; the deepest stage is H/16
        reduce_size = max(x.shape[2] // 16, 1)
        net = _per_view(UTNet)(
            num_classes=self.cfg.num_classes,
            base=max(self.cfg.stem_width // 2, 2),
            reduce_size=reduce_size,
            return_features=True, dtype=self.cfg.dtype, name="net")
        mask, bott = net(x, train)
        return {"mask": mask, "mask_bb": mask,
                "f4_global": bott, "f4_local": bott}


class _CENAdapter(nn.Module):
    """CEN RefineNet (reference CEN.py:193) with views as the exchange
    streams; H/4 logits are upsampled to input resolution. The per-stream
    logits are the per-view masks; the α-ensemble is exposed as extra."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        from glfusion_tpu.models.cen import CENRefineNet

        hh, ww = x.shape[2], x.shape[3]
        logits, ens, alpha = CENRefineNet(
            num_classes=self.cfg.num_classes, dtype=self.cfg.dtype,
            name="net")(x, train)
        mask = resize_bilinear(logits, (hh, ww))
        return {"mask": mask, "mask_bb": mask,
                "f4_global": logits, "f4_local": logits,
                "mask_ensemble": resize_bilinear(ens, (hh, ww)),
                "alpha": alpha}


class _AVSAdapter(nn.Module):
    """AVS family (reference ResNet_AVSModel.py) under the multi-view
    contract. flavors:

      'baseline'     → AVS_baseline (:791): per-view decode, no fusion
      'transfusion'  → AVS_Transfusion (:416): shared B2-ResNet, per-stage
                       channel-transformer fusion
      'model17'      → model17 (:603): per-view B2-ResNets, per-stage
                       multi-view TPAVI
      'pred_endecoder' → Pred_endecoder (:158): 2-stream cross-view TPAVI;
                       adapted to V views by decoding EACH view as 'main'
                       with its ring neighbor as 'other' (shared weights)

    The deepest post-fusion stage features serve as cycle-loss features
    (the reference never trains this family — its entry point hard-codes
    Global_and_Local — so the feature tap is this repo's train contract).
    """

    cfg: ModelConfig
    flavor: str

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        from glfusion_tpu.models.avs import (AVSBaseline, AVSTransfusion,
                                             PredEndecoder)

        hh, ww = x.shape[2], x.shape[3]
        kw = dict(channel=self.cfg.aspp_channels,
                  num_classes=self.cfg.num_classes,
                  widths=tuple(self.cfg.widths),
                  blocks=tuple(self.cfg.block_sizes),
                  return_features=True, dtype=self.cfg.dtype)
        if self.flavor == "baseline":
            # identity-width heads + narrowing decoder — widths come from
            # the backbone, not the uniform `channel` (AVS_baseline :804-812)
            mask, feat = AVSBaseline(
                num_classes=self.cfg.num_classes,
                widths=tuple(self.cfg.widths),
                blocks=tuple(self.cfg.block_sizes),
                return_features=True, dtype=self.cfg.dtype,
                name="net")(x, train)
        elif self.flavor == "pred_endecoder":
            net = PredEndecoder(**kw, name="net")
            v = x.shape[0]
            masks, feats = [], []
            for vi in range(v):
                m, f = net(x[vi], x[(vi + 1) % v], train)
                masks.append(m)
                feats.append(f)
            mask, feat = jnp.stack(masks), jnp.stack(feats)
        else:
            flavor_kw = {
                "transfusion": dict(fusion="transformer"),
                "model17": dict(fusion="tpavi", per_view_params=True),
            }[self.flavor]
            mask, feat = AVSTransfusion(**kw, **flavor_kw, name="net")(
                x, train)
        if mask.shape[2:4] != (hh, ww):
            mask = resize_bilinear(mask, (hh, ww))
        return {"mask": mask, "mask_bb": mask,
                "f4_global": feat, "f4_local": feat}


class _UNetFamilyAdapter(nn.Module):
    """models/unet.py 4-variant family (reference models/unet.py:138 U_Net,
    :204 R2U_Net, :276 AttU_Net, :349 R2AttU_Net) under the multi-view
    contract; the H/16 deepest encoder stage is the cycle-feature tap (the
    reference's entry point never trains this family — main.py:150 — so the
    tap is this repo's train contract)."""

    cfg: ModelConfig
    recurrent: bool
    attention: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        from glfusion_tpu.models.unet import UNet

        # stem_width 64 reproduces the reference widths (64..1024)
        widths = tuple(self.cfg.stem_width * (2 ** i) for i in range(5))
        net = _per_view(UNet)(
            out_channels=self.cfg.num_classes, widths=widths,
            recurrent=self.recurrent, attention=self.attention,
            return_features=True, dtype=self.cfg.dtype, name="net")
        mask, bott = net(x, train)
        return {"mask": mask, "mask_bb": mask,
                "f4_global": bott, "f4_local": bott}


class _Res3DUNetAdapter(nn.Module):
    """ResUNet3D (reference res3dunet.py:6) under the multi-view contract.

    The reference defines the volumetric model but never wires it to
    training (no caller); the adapter folds each view's frame batch into
    ONE volume (frames → depth, edge-padded to the /8 downsample contract),
    so the 3-D context the architecture exists for spans the frames. The
    three coarse deep-supervision heads return as ``mask_aux`` — the train
    step sums them into the loss (reference :210 returns all four maps for
    exactly that use). The 1/8-scale bottleneck, depth-resized back to the
    frame count, is the cycle-feature tap."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        import jax

        from glfusion_tpu.models.res3dunet import ResUNet3D

        v, b = x.shape[0], x.shape[1]
        pad = (-b) % 8
        vol = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2),
                      mode="edge")
        vol = vol[:, None]  # (V, 1, D=b+pad, H, W, C)
        base = max(self.cfg.stem_width // 4, 2)  # stem 64 → reference 16..256
        widths = tuple(base * (2 ** i) for i in range(5))
        net = _per_view(ResUNet3D)(
            out_channels=self.cfg.num_classes, widths=widths,
            return_logits=True, return_features=True,
            dtype=self.cfg.dtype, name="net")
        (o1, o2, o3, o4), feat = net(vol, train)

        def frames(o):  # (V, 1, D, H, W, C) → the b real frames
            return o[:, 0, :b]

        feat = feat[:, 0]  # (V, D/8, h, w, C)
        if feat.shape[1] != b:  # per-frame cycle features
            feat = jax.image.resize(feat, (v, b) + feat.shape[2:], "linear")
        return {"mask": frames(o4), "mask_bb": frames(o4),
                "mask_aux": tuple(frames(o) for o in (o1, o2, o3)),
                "f4_global": feat, "f4_local": feat}


class _LegacyAdapter(nn.Module):
    """model3..model21 family (models/legacy_variants.py) under the Trainer
    contract; the post-fusion f4 serves as cycle features (what the
    reference's train loop would pool, main.py:229)."""

    cfg: ModelConfig
    kind: str

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        from glfusion_tpu.models.legacy_variants import LegacyMultiviewSeg

        kind_kw = {
            # Mutiview_Model :142 / model6 :466 / model7 :509
            "none": dict(fusion="none"),
            # model3 :386 / model8 :640 / model12 :719
            "channel_transformer": dict(fusion="channel_transformer"),
            # model19 :976
            "tpavi": dict(fusion="tpavi"),
            # model18 :919
            "model18": dict(fusion="tpavi", shared_classifier=True),
            # model20 :1109 (stage-interleaved fusion)
            "model20": dict(fusion="tpavi", fusion_stages=(1, 2, 3, 4)),
            # model21 :1193 / model21_for_specific_view :1268
            "decouple": dict(fusion="decouple_tpavi", shared_backbone=True,
                             shared_classifier=True),
            # MLP_fusion :1044
            "mlp_concat": dict(fusion="mlp_concat"),
        }[self.kind]
        out = LegacyMultiviewSeg(self.cfg, **kind_kw, name="net")(x, train)
        return {"mask": out["mask"], "mask_bb": out["mask"],
                "f4_global": out["f4_fusion"], "f4_local": out["f4_fusion"]}


from glfusion_tpu.arch_names import (  # noqa: E402  (re-export)
    AVS_FLAVORS,
    LEGACY_KINDS,
    SEG_ARCHS,
    UNET_KINDS,
)


def build_seg_model(mcfg: ModelConfig) -> Tuple[nn.Module, bool]:
    """(module, is_cps) for the Trainer. ``arch='glfusion'`` keeps the
    reference behavior including the CPS twin via ``variant='cps'``."""
    arch = getattr(mcfg, "arch", "glfusion")
    if arch == "glfusion":
        if mcfg.variant == "cps":
            inner = dataclasses.replace(mcfg, variant="global_and_local")
            return GlobalAndLocalCPS(inner), True
        return GlobalAndLocal(mcfg), False
    if arch == "unet":
        return _MultiviewUNetAdapter(mcfg, fuse=False), False
    if arch == "multiview_unet":
        return _MultiviewUNetAdapter(mcfg, fuse=True), False
    if arch == "utnet":
        return _UTNetAdapter(mcfg), False
    if arch == "cen":
        return _CENAdapter(mcfg), False
    if arch == "res3dunet":
        return _Res3DUNetAdapter(mcfg), False
    if arch.startswith("unet:") and arch[5:] in UNET_KINDS:
        kind = arch[5:]
        return _UNetFamilyAdapter(mcfg, recurrent="r2" in kind,
                                  attention="att" in kind), False
    if arch.startswith("avs_") and arch[4:] in AVS_FLAVORS:
        return _AVSAdapter(mcfg, flavor=arch[4:]), False
    if arch.startswith("legacy:") and arch[7:] in LEGACY_KINDS:
        return _LegacyAdapter(mcfg, kind=arch[7:]), False
    raise ValueError(f"unknown arch {arch!r}; choose from {SEG_ARCHS}")


# ------------------------------------------------------------- regression

def _views_to_channels(clips: jnp.ndarray) -> jnp.ndarray:
    """(V, B, H, W, T) → (B, T, H, W, V): views become input channels."""
    return jnp.transpose(clips, (1, 4, 2, 3, 0))


def _views_axis(clips: jnp.ndarray) -> jnp.ndarray:
    """(V, B, H, W, T) → (B, V, T, H, W): TimeSformer's raw convention."""
    return jnp.transpose(clips, (1, 0, 4, 2, 3))


REG_ARCHS = ("resnet50pah", "r2plus1d", "timesformer", "resnet50pfs")


def build_reg_model(name: str, num_views: int, dtype: str = "float32",
                    **overrides) -> Tuple[nn.Module, Callable]:
    """(module, input_adapter) for the RegressionTrainer.

    dtype: compute dtype threaded into the architecture (params stay fp32)
    — the same ``ModelConfig.dtype`` contract as the segmentation zoo."""
    overrides = dict(overrides, dtype=dtype)
    if name == "resnet50pah":
        from glfusion_tpu.models.resnet3d import Resnet50PAH
        return Resnet50PAH(**overrides), _views_to_channels
    if name == "r2plus1d":
        from glfusion_tpu.models.r2plus1d import R2Plus1D18
        return (R2Plus1D18(num_classes=1, **overrides), _views_to_channels)
    if name == "timesformer":
        from glfusion_tpu.models.timesformer import TimeSformer
        return TimeSformer(num_classes=1, **overrides), _views_axis
    if name == "resnet50pfs":
        # Resnet50PFS (reference mriresnet3d.py:271): the 2-modality MRI
        # regressor, adapted to echo by treating the V views as the
        # modality axis — (B, V, T, H, W) single-channel volumes fold into
        # batch exactly as the reference folds its modalities (:306-308)
        from glfusion_tpu.models.mriresnet3d import Resnet50PFS
        return Resnet50PFS(n_outputs=1, **overrides), _views_axis
    raise ValueError(f"unknown regression model {name!r}; "
                     f"choose from {REG_ARCHS}")
