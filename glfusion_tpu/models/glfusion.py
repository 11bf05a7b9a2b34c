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
  * Ablation variants of the reference are config switches, not code copies:
    Global_only ``:1999``, Local_only ``:2113`` (cycle slot = atten_map,
    ``:2249``), cyc_nofusion ``:2628`` / Global_only_cyc_nofusion ``:3026``
    (same mask graph as their base; the cycle slot returns RAW f4,
    ``:2763``/``:3138``), conv_merge ``:2766`` (concat + per-view 1×1
    merge), Foreground_and_Background ``:2887`` (global path sees
    f4·(1−atten); cycle slot = f4_fusion, ``:3024``), early_fusion
    ``:2251`` (input-level view concat → per-view 1×1 mix, no attention),
    late_fusion ``:2317`` (logit-level concat → per-view 1×1 mix),
    Global_and_Local_Temporal ``:1846`` (video clips fold T into the
    attention token axis — implemented by intent; the reference's
    ``.shape(...)`` call at ``:1962`` never ran).
  * Global_and_Local_CPS ``:3141`` (cross-pseudo-supervision twin) is the
    separate ``GlobalAndLocalCPS`` wrapper below.
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
    """Lift a single-view module over the leading view axis with stacked params.

    ``split_rngs={'params': False}``: every view's replica initializes from
    the SAME rng, i.e. identical starting weights — the reference builds
    each view by ``copy.deepcopy`` of one instance (ours.py:1724-1744), so
    all views start equal and diverge only through their per-view data.
    (Known small deviation: the reference re-creates the classifier/
    centerness FINAL 1×1 convs fresh per view — those ~3k params start
    independent there, identical here.) Dropout stays split: independent
    draws per view, like the reference's independent module calls.
    """
    return nn.vmap(
        module_cls,
        in_axes=(0, None),
        out_axes=0,
        variable_axes={"params": 0, "batch_stats": 0,
                       "intermediates": 0},
        split_rngs={"params": False, "dropout": True},
    )


class PointwiseConv(nn.Module):
    """1×1 conv with a (x, train) signature so it lifts under ``_per_view``."""

    features: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="conv")(x)


class GlobalAndLocal(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 is_video: bool = False,
                 features_only: bool = False,
                 sup_count: "int | None" = None) -> Dict[str, Any]:
        """x: (V, B, H, W, 1) stacked views → dict of stacked outputs.

        is_video: treat B as T frames of one clip and fold it into the
        attention token axis (Global_and_Local_Temporal intent,
        reference ``models/ours.py:1959-1980``).

        features_only: compute ONLY f4_global (the cycle-loss features) —
        backbone + global attention, skipping the classifier/centerness/
        local/mask tail whose outputs the cycle pass discards. ~3/4 of the
        reference train step is the 120-frame cycle forward, so this is the
        TPU-first fast path (cfg.train.cycle_light); the only semantic
        difference from the reference is that the skipped heads' BN running
        stats don't update on cycle frames. Unsupported for the fg_bg
        variant (its global branch needs the head-derived atten map).

        sup_count: fused supervised+cycle pass — x is the supervised batch
        (first ``sup_count`` frames along axis 1) concatenated with the
        cycle-clip frames. The backbone (and, where the variant's cycle
        slot needs it, the global attention) runs ONCE over the whole
        concatenation; the classifier/centerness/local tail runs only on
        the supervised slice. Returned ``mask``/``mask_bb``/``f4_local``
        cover the supervised frames; ``f4_global`` covers ONLY the cycle
        frames (what the cycle loss pools). One backbone dispatch per
        train step instead of two — the frames-as-batch convs see the
        merged batch, amortizing per-pass fixed costs (cfg.train
        .fuse_passes; measured in BASELINE.md). BN semantics: batch
        moments are computed over the merged supervised+cycle batch
        (the reference's two sequential calls update running stats
        twice with per-pass moments); head BN sees supervised frames
        only, exactly like cycle_light. Same variant restrictions as
        features_only.
        """
        cfg = self.cfg
        v, b, hh, ww, _ = x.shape
        assert v == cfg.num_views, (v, cfg.num_views)
        if sup_count is not None:
            if features_only or is_video:
                raise ValueError("sup_count is exclusive of features_only/"
                                 "is_video")
            if not 0 < sup_count < b:
                raise ValueError(
                    f"sup_count={sup_count} must split the batch axis ({b})")
            if cfg.variant in ("fg_bg", "local_only"):
                raise ValueError(
                    f"sup_count (fused passes) is unsupported for "
                    f"{cfg.variant!r} (its cycle features need the "
                    "classifier heads)")

        backbone = _per_view(ResNetIEKD)(
            stem_width=cfg.stem_width,
            block_sizes=tuple(cfg.block_sizes),
            widths=tuple(cfg.widths),
            expansion=cfg.expansion,
            dilate_stages=tuple(cfg.dilate_stages),
            dtype=cfg.dtype,
            remat=cfg.remat,
            remat_stages=(tuple(cfg.remat_stages)
                          if cfg.remat_stages is not None else None),
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
        # The cyc_nofusion classes (reference :2628, :3026) are the SAME
        # mask graph as their base variant — only the cycle-feature slot
        # returns RAW f4 instead of the attended features (:2763, :3138).
        variant = cfg.variant
        cyc_raw = False
        if variant == "cyc_nofusion":
            variant, cyc_raw = "global_and_local", True
        elif variant == "global_only_cyc_nofusion":
            variant, cyc_raw = "global_only", True

        if variant == "early_fusion":
            # Input-level fusion (reference :2299-2303): channel-concat the V
            # 1-ch view images, per-view 1×1 conv mixes V→1 before the
            # per-view backbone. No attention anywhere.
            concat = jnp.moveaxis(x[..., 0], 0, -1)       # (B, H, W, V)
            concat = jnp.broadcast_to(concat[None], (v,) + concat.shape)
            x = _per_view(PointwiseConv)(features=1, name="early_mix")(
                concat, train)

        f4 = backbone(x, train)  # (V, B, h, w, C)

        def attend(feat: jnp.ndarray, name: str) -> jnp.ndarray:
            """TPAVI over (V,B,h,w,C); folds B(=T) into tokens if is_video."""
            attn = TPAVI(inter_channels=cfg.tpavi_inter_channels,
                         attn_impl=attn_impl, dtype=cfg.dtype, name=name)
            y = jnp.swapaxes(feat, 0, 1)  # (B, V, h, w, C)
            if is_video:
                bb, vv, fh, fw, fc = y.shape
                y = y.reshape(1, bb * vv, fh, fw, fc)  # tokens = T·V·h·w
                y = attn(y, train).reshape(bb, vv, fh, fw, fc)
            else:
                y = attn(y, train)
            return jnp.swapaxes(y, 0, 1)

        if features_only:
            # fg_bg's cycle slot is the full global+local f4_fusion
            # (:3024) and local_only's is the head-derived atten map
            # (:2249) — neither can skip the heads, so features_only would
            # CHANGE the loss, not just the BN stats. Refuse.
            if variant in ("fg_bg", "local_only"):
                raise ValueError(
                    f"features_only is unsupported for {cfg.variant!r} "
                    "(its cycle features need the classifier heads)")
            use_g = not cyc_raw and variant in (
                "global_and_local", "global_only", "conv_merge")
            feat = attend(f4, "global_attn") if use_g else f4
            return {"f4_global": feat}

        # Fused supervised+cycle pass: split AFTER the backbone (and after
        # the global attention when the variant's cycle slot consumes it);
        # everything below runs on the supervised slice only.
        f4_cycle_fused = None
        g_pre = None
        if sup_count is not None:
            use_g = not cyc_raw and variant in (
                "global_and_local", "global_only", "conv_merge")
            if use_g:
                g_all = attend(f4, "global_attn")
                f4_cycle_fused = g_all[:, sup_count:]
                g_pre = g_all[:, :sup_count]
            else:
                f4_cycle_fused = f4[:, sup_count:]
            f4 = f4[:, :sup_count]

        use_global = variant in ("global_and_local", "global_only",
                                 "conv_merge", "fg_bg")
        use_local = variant in ("global_and_local", "local_only",
                                "conv_merge", "fg_bg")

        f4_global_fusion = None
        f4_local_fusion = None
        atten = None
        cls_f4 = None  # classifier(f4) logits, reusable for mask_bb in eval

        if use_local:
            # M_cls: classifier at f4 resolution, sigmoid, max over classes.
            cls_f4 = classifier(f4, train)
            m_cls = nn.sigmoid(cls_f4)
            m_cls = jnp.max(m_cls, axis=-1, keepdims=True)  # (V,B,h,w,1)
            # M_ctr
            m_ctr = nn.sigmoid(centerness(f4, train))  # (V,B,h,w,1)
            atten = nn.sigmoid(cfg.center_aware_weight * m_cls * m_ctr)
            f4_local_fusion = attend(f4 * atten, "local_attn")

        if use_global:
            # fg_bg (reference :2997-3000): the global branch attends over the
            # background-masked features f4·(1−atten) instead of raw f4.
            g_in = f4 * (1.0 - atten) if variant == "fg_bg" else f4
            # fused pass already attended over the merged batch above
            f4_global_fusion = (g_pre if g_pre is not None
                                else attend(g_in, "global_attn"))

        if variant in ("global_and_local", "fg_bg"):
            f4_fusion = f4_global_fusion + f4_local_fusion
        elif variant == "conv_merge":
            # reference :2795-2798: concat(global, local) → 1×1 conv → ReLU
            merged = jnp.concatenate([f4_global_fusion, f4_local_fusion],
                                     axis=-1)
            f4_fusion = nn.relu(_per_view(PointwiseConv)(
                features=f4.shape[-1], name="merge")(merged, train))
        elif variant == "global_only":
            f4_fusion = f4_global_fusion
        elif variant == "local_only":
            f4_fusion = f4_local_fusion
        elif variant in ("early_fusion", "late_fusion"):
            f4_fusion = f4
        else:
            raise ValueError(f"unknown variant {variant!r}")

        mask = classifier(f4_fusion, train)  # (V, B, h, w, 5)
        if cls_f4 is None and f4_fusion is f4 and not train:
            # early/late_fusion decode RAW f4: these pre-mix logits are
            # bit-identical to classifier(f4) in eval — reusable as mask_bb
            cls_f4 = mask
        if variant == "late_fusion":
            # Logit-level fusion (reference :2372-2375): concat the V per-view
            # 5-ch logit maps → per-view 1×1 conv mixes 5V→5.
            cat = jnp.concatenate([mask[i] for i in range(v)], axis=-1)
            cat = jnp.broadcast_to(cat[None], (v,) + cat.shape)
            mask = _per_view(PointwiseConv)(features=cfg.num_classes,
                                            name="late_mix")(cat, train)
        mask = resize_bilinear(mask, (hh, ww))
        # In eval mode classifier(f4) was already computed for M_cls (BN
        # frozen, dropout off → bit-identical); reuse it and save a full
        # ASPP-head pass per view. Train mode keeps the reference's two
        # calls (independent dropout draws + two BN stat updates).
        if cls_f4 is not None and not train:
            mask_bb = cls_f4
        else:
            mask_bb = classifier(f4, train)
        mask_bb = resize_bilinear(mask_bb, (hh, ww))

        # Cycle-feature slot: faithful to each reference class's 3rd return
        # value (what main.py:220 pools for the cycle loss).
        if f4_cycle_fused is not None:
            f4_cycle = f4_cycle_fused  # cycle frames only (fused pass)
        elif cyc_raw:
            f4_cycle = f4                # cyc_nofusion :2763, :3138
        elif variant == "fg_bg":
            f4_cycle = f4_fusion         # :3024 (global + local sum)
        elif variant == "local_only":
            f4_cycle = atten             # :2249 atten_map (V, B, h, w, 1)
        elif f4_global_fusion is not None:
            f4_cycle = f4_global_fusion  # :1843, :2111, :2884
        else:
            # early/late_fusion return None here (:2315, :2383) — their
            # cycle path could never run in the reference; raw f4 is the
            # working extension
            f4_cycle = f4
        if f4_local_fusion is None:
            f4_local_fusion = f4

        return {
            "mask": mask,                       # (V, B, H, W, 5) logits
            "mask_bb": mask_bb,                 # (V, B, H, W, 5) logits
            "f4_global": f4_cycle,              # (V, B, h, w, C)
            "f4_local": f4_local_fusion,        # (V, B, h, w, C)
        }


class GlobalAndLocalCPS(nn.Module):
    """Cross-pseudo-supervision twin (reference ``models/ours.py:3141-3351``).

    Two independently-initialized Global_and_Local networks run on the same
    multi-view input; the trainer supervises each with the other's
    thresholded predictions (CPS). Returns both mask sets plus network 1's
    fusion features (matching the reference's 4-tuple
    ``(mask, mask_2, f4_global_fusion, f4_local_fusion)`` at ``:3351``).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        out1 = GlobalAndLocal(self.cfg, name="net1")(x, train)
        out2 = GlobalAndLocal(self.cfg, name="net2")(x, train)
        return {
            "mask": out1["mask"],
            "mask_2": out2["mask"],
            "f4_global": out1["f4_global"],
            "f4_local": out1["f4_local"],
        }
