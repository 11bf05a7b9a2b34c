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
                            fuse=self.fuse, name="net")(x, train)
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
            return_features=True, name="net")
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
            num_classes=self.cfg.num_classes, name="net")(x, train)
        mask = resize_bilinear(logits, (hh, ww))
        return {"mask": mask, "mask_bb": mask,
                "f4_global": logits, "f4_local": logits,
                "mask_ensemble": resize_bilinear(ens, (hh, ww)),
                "alpha": alpha}


SEG_ARCHS = ("glfusion", "unet", "multiview_unet", "utnet", "cen")


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
    raise ValueError(f"unknown arch {arch!r}; choose from {SEG_ARCHS}")


# ------------------------------------------------------------- regression

def _views_to_channels(clips: jnp.ndarray) -> jnp.ndarray:
    """(V, B, H, W, T) → (B, T, H, W, V): views become input channels."""
    return jnp.transpose(clips, (1, 4, 2, 3, 0))


def _views_axis(clips: jnp.ndarray) -> jnp.ndarray:
    """(V, B, H, W, T) → (B, V, T, H, W): TimeSformer's raw convention."""
    return jnp.transpose(clips, (1, 0, 4, 2, 3))


REG_ARCHS = ("resnet50pah", "r2plus1d", "timesformer")


def build_reg_model(name: str, num_views: int,
                    **overrides) -> Tuple[nn.Module, Callable]:
    """(module, input_adapter) for the RegressionTrainer."""
    if name == "resnet50pah":
        from glfusion_tpu.models.resnet3d import Resnet50PAH
        return Resnet50PAH(**overrides), _views_to_channels
    if name == "r2plus1d":
        from glfusion_tpu.models.r2plus1d import R2Plus1D18
        return (R2Plus1D18(num_classes=1, **overrides), _views_to_channels)
    if name == "timesformer":
        from glfusion_tpu.models.timesformer import TimeSformer
        return TimeSformer(num_classes=1, **overrides), _views_axis
    raise ValueError(f"unknown regression model {name!r}; "
                     f"choose from {REG_ARCHS}")
