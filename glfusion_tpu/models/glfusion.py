"""Global_and_Local — the GL-Fusion production model, TPU-native assembly.

Reference semantics (``models/ours.py:1708-1843``):
  1. Per-view ResNet-50-IEKD backbones → f4 (B, h, w, 2048) per view.
  2. M_cls: per-view DeepLab classifier on f4 → sigmoid → max over the 5
     class channels (the ``AdaptiveMaxPool3d((1,h,w))`` trick, ``:1806-1807``).
  3. M_ctr: per-view centerness DeepLab head (1 ch) → sigmoid.
  4. Center-aware map: atten = sigmoid(w · M_cls · M_ctr); f4_local = f4 ⊙ atten.
  5. MGFM: TPAVI over stacked f4; MLFM: TPAVI over stacked f4_local.
  6. f4_fusion = global + local → per-view classifier → bilinear ×4 to input
     size; mask_bb = classifier(f4) upsampled (backbone-only logits).
  Returns (mask, mask_bb, f4_global_fusion, f4_local_fusion).

TPU-first redesign:
  * Views are a stacked leading axis; per-view parameter replicas (the
    reference's deep-copied ModuleDicts, ``:1724-1744``) are a stacked
    parameter axis via ``nn.vmap`` — the per-view Python loop becomes one
    compiled, MXU-batched computation.
  * Ablation variants of the reference (Global_only ``:1999``, Local_only
    ``:2113``, cyc_nofusion ``:2628``) are config switches, not code copies.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from glfusion_tpu.config import ModelConfig
from glfusion_tpu.models.aspp import DeepLabHead
from glfusion_tpu.models.resnet import ResNetIEKD
from glfusion_tpu.models.tpavi import TPAVI
from glfusion_tpu.ops.resize import resize_bilinear


def _per_view(module_cls):
    """Lift a single-view module over the leading view axis with stacked params."""
    return nn.vmap(
        module_cls,
        in_axes=(0, None),
        out_axes=0,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
    )


class GlobalAndLocal(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        """x: (V, B, H, W, 1) stacked views → dict of stacked outputs."""
        cfg = self.cfg
        v, b, hh, ww, _ = x.shape
        assert v == cfg.num_views, (v, cfg.num_views)

        backbone = _per_view(ResNetIEKD)(
            stem_width=cfg.stem_width,
            block_sizes=tuple(cfg.block_sizes),
            widths=tuple(cfg.widths),
            expansion=cfg.expansion,
            dilate_stages=tuple(cfg.dilate_stages),
            dtype=cfg.dtype,
            remat=cfg.remat,
            name="backbone",
        )
        classifier = _per_view(DeepLabHead)(
            num_outputs=cfg.num_classes,
            channels=cfg.aspp_channels,
            rates=tuple(cfg.aspp_rates),
            dropout=cfg.aspp_dropout,
            dtype=cfg.dtype,
            name="classifier",
        )
        centerness = _per_view(DeepLabHead)(
            num_outputs=1,
            channels=cfg.aspp_channels,
            rates=tuple(cfg.aspp_rates),
            dropout=cfg.aspp_dropout,
            dtype=cfg.dtype,
            name="centerness",
        )

        attn_impl = "pallas" if cfg.use_pallas_fusion else "auto"

        f4 = backbone(x, train)  # (V, B, h, w, C)

        variant = cfg.variant
        use_global = variant in ("global_and_local", "global_only")
        use_local = variant in ("global_and_local", "local_only")

        f4_global_fusion = None
        f4_local_fusion = None

        if use_local:
            # M_cls: classifier at f4 resolution, sigmoid, max over classes.
            m_cls = nn.sigmoid(classifier(f4, train))
            m_cls = jnp.max(m_cls, axis=-1, keepdims=True)  # (V,B,h,w,1)
            # M_ctr
            m_ctr = nn.sigmoid(centerness(f4, train))  # (V,B,h,w,1)
            atten = nn.sigmoid(cfg.center_aware_weight * m_cls * m_ctr)
            f4_local = f4 * atten
            local_attn = TPAVI(inter_channels=cfg.tpavi_inter_channels,
                               attn_impl=attn_impl, dtype=cfg.dtype,
                               name="local_attn")
            # TPAVI expects (B, V, h, w, C)
            f4_local_fusion = local_attn(
                jnp.swapaxes(f4_local, 0, 1), train)
            f4_local_fusion = jnp.swapaxes(f4_local_fusion, 0, 1)

        if use_global:
            global_attn = TPAVI(inter_channels=cfg.tpavi_inter_channels,
                                attn_impl=attn_impl, dtype=cfg.dtype,
                                name="global_attn")
            f4_global_fusion = global_attn(jnp.swapaxes(f4, 0, 1), train)
            f4_global_fusion = jnp.swapaxes(f4_global_fusion, 0, 1)

        if variant == "global_and_local":
            f4_fusion = f4_global_fusion + f4_local_fusion
        elif variant == "global_only":
            f4_fusion = f4_global_fusion
        elif variant == "local_only":
            f4_fusion = f4_local_fusion
        elif variant == "no_fusion":
            f4_fusion = f4
        else:
            raise ValueError(f"unknown variant {variant!r}")

        mask = classifier(f4_fusion, train)  # (V, B, h, w, 5)
        mask = resize_bilinear(mask, (hh, ww))
        mask_bb = classifier(f4, train)
        mask_bb = resize_bilinear(mask_bb, (hh, ww))

        if f4_global_fusion is None:
            f4_global_fusion = f4
        if f4_local_fusion is None:
            f4_local_fusion = f4

        return {
            "mask": mask,                       # (V, B, H, W, 5) logits
            "mask_bb": mask_bb,                 # (V, B, H, W, 5) logits
            "f4_global": f4_global_fusion,      # (V, B, h, w, C)
            "f4_local": f4_local_fusion,        # (V, B, h, w, C)
        }
