"""Jitted, mesh-sharded train / eval steps.

One train step = the reference's inner loop body (``main.py:193-243``):
  1. multi-view supervised forward → Σ_views BCE-sum(mask, target)
  2. cycle forward on per-view clips (frames-as-batch) → f4_global pooled
     over space → per-view cycle loss
  3. total = seg + 1e-2·cycle; Adam update.

Both forwards share one traced graph; BN statistics flow first→second→update,
matching the reference's sequential module calls. Gradients reduce over the
``data`` mesh axis implicitly (GSPMD) because parameters are replicated there.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from glfusion_tpu.config import Config, default_compiler_options
from glfusion_tpu.train.losses import (
    bce_with_logits_sum,
    dense_seg_cycle_loss,
    seg_cycle_loss,
)
from glfusion_tpu.train.metrics import confusion_counts
from glfusion_tpu.train.train_state import TrainState


def _test_view_indices(cfg: Config) -> tuple:
    """Indices of the supervised (loss-bearing) views within model.views.

    A test view absent from the model's views is a misconfiguration: the
    supervised BCE term would silently vanish and training would proceed
    on the cycle loss alone (the reference KeyErrors immediately,
    main.py:209-211)."""
    views = tuple(cfg.model.views)
    missing = [v for v in cfg.train.test_views if v not in views]
    if missing:
        raise ValueError(
            f"test_views {missing} not in model views {views}; the "
            f"supervised loss would be silently empty")
    return tuple(views.index(v) for v in cfg.train.test_views)


def make_train_step(cfg: Config, model, fuse_preprocess: bool = False,
                    cps: bool = False,
                    compiler_options: "dict | None | str" = "default",
                    sup_model=None):
    """fuse_preprocess=True: the step takes RAW host batches (images_raw,
    masks_raw, clips) and runs the crop/normalize/remap preprocessing inside
    the same jit — ONE dispatch per step instead of several, which is what
    dominates wall time on high-latency device transports.

    cps=True: ``model`` is the two-network ``GlobalAndLocalCPS`` twin
    (reference ``models/ours.py:3141-3351``). The reference ships the model
    but no training path (SURVEY.md §2.4); the intent — cross pseudo
    supervision (Chen et al., CVPR'21) — is implemented here: both networks
    get the supervised BCE, plus each network's logits are supervised by
    the OTHER network's thresholded (stop-gradient) predictions, weighted
    by ``cfg.train.cps_weight``.

    compiler_options: "default" applies the measured-winning TPU options
    (``config.TPU_COMPILER_OPTIONS``); pass ``None`` when the step will be
    wrapped in an OUTER jit (e.g. a chained-scan benchmark) — JAX rejects
    compiler options on nested jits — and apply them to the outer compile
    instead.

    sup_model: optional module for the SUPERVISED forward only (the cycle
    forward keeps ``model``). It must share ``model``'s parameter/batch_stats
    tree — ``nn.remat`` preserves variable structure, so a no-remat twin of
    a rematted model qualifies. Used for per-pass rematerialization: only
    the 120-frame cycle pass needs activation recompute to fit HBM; the
    small supervised pass (batch·V frames) can keep its activations and
    skip the recompute (measured in BASELINE.md)."""
    if compiler_options == "default":
        compiler_options = default_compiler_options()
    views = tuple(cfg.model.views)
    test_idx = _test_view_indices(cfg)
    tc = cfg.train
    if tc.fuse_passes:
        if cps or tc.temporal:
            raise ValueError("fuse_passes is exclusive of CPS/temporal "
                             "(see TrainConfig.fuse_passes)")
        if sup_model is not None:
            raise ValueError("fuse_passes runs one merged pass; "
                             "remat_supervised=False (a separate "
                             "supervised-pass module) cannot apply")
    accum = int(tc.grad_accum)
    if accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {accum}")
    if accum > 1 and tc.fuse_passes:
        raise ValueError("grad_accum > 1 is exclusive of fuse_passes: one "
                         "knob merges the passes into a single forward, the "
                         "other splits them (see TrainConfig.grad_accum)")
    view_ids = None
    if fuse_preprocess:
        from glfusion_tpu.data.pipeline import view_ids_tuple
        view_ids = view_ids_tuple(views)

    def train_step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        rng_drop, rng_cyc_drop, rng_cyc = jax.random.split(rng, 3)
        if fuse_preprocess:
            from glfusion_tpu.data.pipeline import _preprocess_core
            rng_pre, rng_drop = jax.random.split(rng_drop)
            pre = _preprocess_core(
                rng_pre, batch["images_raw"], batch["masks_raw"],
                crop_hw=cfg.data.crop_hw, is_train=True, view_ids=view_ids)
            batch = dict(batch, **pre)

        def loss_fn(params):
            fused_feat = None
            if tc.fuse_passes and tc.use_cycle and "clips" in batch:
                # one merged backbone(+global-attention) pass over the
                # supervised batch and the cycle clip; the model slices
                # the head tail onto the supervised frames and returns
                # the cycle frames' features in f4_global
                sup_n = batch["images"].shape[1]
                xcat = jnp.concatenate(
                    [batch["images"],
                     batch["clips"].astype(batch["images"].dtype)], axis=1)
                out, upd = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    xcat, True, mutable=["batch_stats"],
                    rngs={"dropout": rng_drop}, sup_count=sup_n)
                fused_feat = out["f4_global"]
            else:
                out, upd = (sup_model or model).apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["images"], True, mutable=["batch_stats"],
                    rngs={"dropout": rng_drop})
            seg_loss = 0.0
            for vi in test_idx:
                seg_loss += bce_with_logits_sum(out["mask"][vi],
                                                batch["masks"][vi])
            # deep-supervision heads (res3dunet adapter): every auxiliary
            # scale's logits sum into the supervised loss (reference
            # res3dunet.py:210 returns all four maps for exactly this use)
            for aux in out.get("mask_aux", ()):
                for vi in test_idx:
                    seg_loss += bce_with_logits_sum(aux[vi],
                                                    batch["masks"][vi])
            if cps:
                # supervised loss on BOTH networks, then cross pseudo
                # supervision: each net learns the other's hard predictions
                pseudo1 = jax.lax.stop_gradient(
                    (out["mask"] > 0.0).astype(batch["masks"].dtype))
                pseudo2 = jax.lax.stop_gradient(
                    (out["mask_2"] > 0.0).astype(batch["masks"].dtype))
                cps_loss = 0.0
                for vi in test_idx:
                    seg_loss += bce_with_logits_sum(out["mask_2"][vi],
                                                    batch["masks"][vi])
                    cps_loss += bce_with_logits_sum(out["mask"][vi],
                                                    pseudo2[vi])
                    cps_loss += bce_with_logits_sum(out["mask_2"][vi],
                                                    pseudo1[vi])
                seg_loss += tc.cps_weight * cps_loss
            bstats = upd["batch_stats"]

            cyc_loss = jnp.float32(0.0)
            if tc.use_cycle and "clips" in batch:
                if fused_feat is not None:
                    feat = jnp.sum(fused_feat, axis=(2, 3))  # (V, T, C)
                else:
                    light = ({"features_only": True}
                             if tc.cycle_light else {})
                    if tc.temporal:
                        # Global_and_Local_Temporal: fold the clip's T
                        # frames into the attention token axis (reference
                        # intent, models/ours.py:1959-1980)
                        light["is_video"] = True
                    out2, upd2 = model.apply(
                        {"params": params, "batch_stats": bstats},
                        batch["clips"], True, mutable=["batch_stats"],
                        rngs={"dropout": rng_cyc_drop}, **light)
                    bstats = upd2["batch_stats"]
                    feat = jnp.sum(out2["f4_global"], axis=(2, 3))
                kw = dict(target_region=tc.cycle_target_region,
                          cyc_off=tc.cycle_offset, chunk=tc.cycle_chunk,
                          temperature=tc.cycle_temperature)
                for vi in range(len(views)):
                    if tc.dense_cyc:
                        cyc_loss += dense_seg_cycle_loss(feat[vi], **kw)
                    else:
                        cyc_loss += seg_cycle_loss(
                            jax.random.fold_in(rng_cyc, vi), feat[vi], **kw)

            total = seg_loss + tc.cycle_weight * cyc_loss
            return total, (bstats, seg_loss, cyc_loss, out["mask"])

        (total, (bstats, seg_loss, cyc_loss, mask_logits)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params))
        if tc.checkify:
            from jax.experimental import checkify
            gnorm = jnp.sqrt(sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(grads)))
            checkify.check(jnp.isfinite(total),
                           "non-finite training loss {loss}", loss=total)
            checkify.check(jnp.isfinite(gnorm),
                           "non-finite gradient norm {gnorm}", gnorm=gnorm)
        state = state.apply_gradients(grads=grads, batch_stats=bstats)

        pred = (mask_logits > 0.0).astype(jnp.float32)
        counts = confusion_counts(pred, batch["masks"],
                                  axis=tuple(range(1, mask_logits.ndim)))
        metrics = {"loss": total, "seg_loss": seg_loss, "cyc_loss": cyc_loss,
                   **counts}
        return state, metrics

    if accum > 1:
        # Gradient accumulation (TrainConfig.grad_accum): the batch carries
        # batch_size·accum frames per view; a lax.scan runs the supervised
        # forward/backward per microbatch, summing gradients, then the
        # cycle clip pass contributes its gradient ONCE, and a single
        # optimizer update applies. Under the sum-reduction BCE the summed
        # gradient equals the full-batch gradient exactly; only BN batch
        # moments are per-microbatch (= the reference DataParallel's
        # per-GPU moments, main.py:155). BN running stats thread
        # microbatch→microbatch→cycle, matching the sequential module
        # calls of `accum` reference steps.
        def train_step(state: TrainState, batch: Dict[str, Any],  # noqa: F811
                       rng: jax.Array):
            rng_drop, rng_cyc_drop, rng_cyc = jax.random.split(rng, 3)
            if fuse_preprocess:
                from glfusion_tpu.data.pipeline import _preprocess_core
                rng_pre, rng_drop = jax.random.split(rng_drop)
                pre = _preprocess_core(
                    rng_pre, batch["images_raw"], batch["masks_raw"],
                    crop_hw=cfg.data.crop_hw, is_train=True,
                    view_ids=view_ids)
                batch = dict(batch, **pre)

            n = batch["images"].shape[1]
            if n % accum:
                raise ValueError(
                    f"batch of {n} frames/view does not divide into "
                    f"grad_accum={accum} microbatches")
            mb = n // accum

            def split_mb(x):
                # (V, accum·mb, ...) -> (accum, V, mb, ...); microbatch a
                # is the contiguous slice [a·mb:(a+1)·mb] of the batch axis
                return jnp.moveaxis(
                    x.reshape((x.shape[0], accum, mb) + x.shape[2:]), 1, 0)

            def sup_loss_fn(params, bstats, images, masks, rng_d):
                out, upd = (sup_model or model).apply(
                    {"params": params, "batch_stats": bstats},
                    images, True, mutable=["batch_stats"],
                    rngs={"dropout": rng_d})
                seg = 0.0
                for vi in test_idx:
                    seg += bce_with_logits_sum(out["mask"][vi], masks[vi])
                for aux in out.get("mask_aux", ()):  # deep supervision
                    for vi in test_idx:
                        seg += bce_with_logits_sum(aux[vi], masks[vi])
                if cps:
                    pseudo1 = jax.lax.stop_gradient(
                        (out["mask"] > 0.0).astype(masks.dtype))
                    pseudo2 = jax.lax.stop_gradient(
                        (out["mask_2"] > 0.0).astype(masks.dtype))
                    cps_loss = 0.0
                    for vi in test_idx:
                        seg += bce_with_logits_sum(out["mask_2"][vi],
                                                   masks[vi])
                        cps_loss += bce_with_logits_sum(out["mask"][vi],
                                                        pseudo2[vi])
                        cps_loss += bce_with_logits_sum(out["mask_2"][vi],
                                                        pseudo1[vi])
                    seg += tc.cps_weight * cps_loss
                return seg, (upd["batch_stats"], out["mask"])

            def scan_body(carry, xs):
                bstats, gacc, segacc, cacc = carry
                images, masks, a = xs

                def f(p):
                    return sup_loss_fn(p, bstats, images, masks,
                                       jax.random.fold_in(rng_drop, a))

                (seg, (bstats, logits)), g = (
                    jax.value_and_grad(f, has_aux=True)(state.params))
                pred = (logits > 0.0).astype(jnp.float32)
                cnt = confusion_counts(pred, masks,
                                       axis=tuple(range(1, logits.ndim)))
                return (bstats,
                        jax.tree_util.tree_map(jnp.add, gacc, g),
                        segacc + seg,
                        jax.tree_util.tree_map(jnp.add, cacc, cnt)), None

            nviews = batch["images"].shape[0]
            zero_counts = {k: jnp.zeros((nviews,), jnp.float32)
                           for k in ("tp", "fp", "fn", "tn")}
            init = (state.batch_stats,
                    jax.tree_util.tree_map(jnp.zeros_like, state.params),
                    jnp.float32(0.0), zero_counts)
            (bstats, grads, seg_loss, counts), _ = jax.lax.scan(
                scan_body, init,
                (split_mb(batch["images"]), split_mb(batch["masks"]),
                 jnp.arange(accum)))

            cyc_loss = jnp.float32(0.0)
            if tc.use_cycle and "clips" in batch:
                def cyc_fn(p):
                    light = ({"features_only": True}
                             if tc.cycle_light else {})
                    if tc.temporal:
                        light["is_video"] = True
                    out2, upd2 = model.apply(
                        {"params": p, "batch_stats": bstats},
                        batch["clips"], True, mutable=["batch_stats"],
                        rngs={"dropout": rng_cyc_drop}, **light)
                    feat = jnp.sum(out2["f4_global"], axis=(2, 3))
                    kw = dict(target_region=tc.cycle_target_region,
                              cyc_off=tc.cycle_offset, chunk=tc.cycle_chunk,
                              temperature=tc.cycle_temperature)
                    cyc = jnp.float32(0.0)
                    for vi in range(len(views)):
                        if tc.dense_cyc:
                            cyc += dense_seg_cycle_loss(feat[vi], **kw)
                        else:
                            cyc += seg_cycle_loss(
                                jax.random.fold_in(rng_cyc, vi), feat[vi],
                                **kw)
                    return tc.cycle_weight * cyc, (upd2["batch_stats"], cyc)

                (wcyc, (bstats, cyc_loss)), gcyc = (
                    jax.value_and_grad(cyc_fn, has_aux=True)(state.params))
                grads = jax.tree_util.tree_map(jnp.add, grads, gcyc)
                total = seg_loss + wcyc
            else:
                total = seg_loss

            if tc.checkify:
                from jax.experimental import checkify
                gnorm = jnp.sqrt(sum(
                    jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree_util.tree_leaves(grads)))
                checkify.check(jnp.isfinite(total),
                               "non-finite training loss {loss}", loss=total)
                checkify.check(jnp.isfinite(gnorm),
                               "non-finite gradient norm {gnorm}",
                               gnorm=gnorm)
            state = state.apply_gradients(grads=grads, batch_stats=bstats)
            metrics = {"loss": total, "seg_loss": seg_loss,
                       "cyc_loss": cyc_loss, **counts}
            return state, metrics

    if cfg.train.checkify:
        # functional sanitizer (reference main.py:37
        # torch.autograd.set_detect_anomaly): explicit finiteness checks
        # on the loss and the gradient norm run INSIDE the compiled step
        # and surface host-side via err.throw() — divergence stops the
        # run one step after the offending step. (Instrumenting every
        # primitive with checkify.float_checks was measured impractical:
        # the transform blows up trace/compile time even at toy widths.
        # Op-level NaN hunting is --debug-nans / jax_debug_nans.)
        from jax.experimental import checkify

        checked = checkify.checkify(train_step,
                                    errors=checkify.user_checks)
        jitted = jax.jit(checked, donate_argnums=(0,),
                         compiler_options=compiler_options)

        # err.throw() blocks on a device→host fetch of the error payload;
        # throwing the PREVIOUS step's error instead keeps one step in
        # flight, so the fetch overlaps the current step's execution rather
        # than serializing dispatch (per-step fetches dominate wall time on
        # high-latency transports — trainer.py:205-208). Divergence still
        # stops the run, one step late. The trainer flushes the final
        # pending error at epoch end via ``checkify_flush``.
        pending = []

        def checked_step(state, batch, rng):
            err, out = jitted(state, batch, rng)
            if pending:
                pending.pop(0).throw()
            pending.append(err)
            return out

        def checkify_flush():
            while pending:
                pending.pop(0).throw()

        checked_step.checkify_flush = checkify_flush
        return checked_step

    return jax.jit(train_step, donate_argnums=(0,),
                   compiler_options=compiler_options)


def make_eval_step(cfg: Config, model,
                   compiler_options: "dict | None | str" = "default"):
    """Forward on a stacked multi-view batch, returns logits + counts.

    Implements the eval contract of ``main.py:500-519``: fused prediction
    (``pred_frames, _ = model(imgs)`` — the final fused mask), sum-BCE loss,
    confusion counts over all pixels plus per-structure counts.

    compiler_options: see ``make_train_step`` — pass ``None`` when wrapping
    in an outer jit.
    """
    if compiler_options == "default":
        compiler_options = default_compiler_options()
    # the eval loss, like the train loss, sums over the TEST views only
    # (reference main.py:511-512: ``for view in self.test_view``) — summing
    # all views would inflate val loss relative to both the reference and
    # the training objective
    test_idx = _test_view_indices(cfg)

    @functools.partial(jax.jit,
                       compiler_options=compiler_options)
    def eval_step(state: TrainState, batch: Dict[str, Any]):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"], False)
        logits = out["mask"]  # (V, B, H, W, 5)
        loss = 0.0
        for vi in test_idx:
            loss += bce_with_logits_sum(logits[vi], batch["masks"][vi])
        pred = (logits > 0.0).astype(jnp.float32)
        # overall per-view counts
        reduce_all = tuple(range(1, logits.ndim))
        counts = confusion_counts(pred, batch["masks"], axis=reduce_all)
        # per-view per-part counts: reduce all but view and class axes
        reduce_parts = tuple(range(1, logits.ndim - 1))
        part_counts = confusion_counts(pred, batch["masks"], axis=reduce_parts)
        return {"loss": loss, "counts": counts, "part_counts": part_counts,
                "logits": logits}

    return eval_step
