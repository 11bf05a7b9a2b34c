"""Trainer: the reference's train/val/test loops, TPU-native.

Mirrors ``main.py``'s Trainer surface — ``train()``, ``evaluate()``,
``validation_and_test()`` — with jit-compiled steps, a device mesh, Orbax
checkpointing, and JSONL metric logs. The reference's broken paths
(SURVEY.md §2.4) are implemented by intent: cycle loaders wrap the aligned
video dataset; eval unpacks the model's dict output.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from glfusion_tpu.config import Config
from glfusion_tpu.data.infos import PatientIndex, load_infos, load_split
from glfusion_tpu.data.pipeline import (
    AlignedClipLoader,
    SegFrameLoader,
    TestClipLoader,
    view_ids_tuple,
)
from glfusion_tpu.parallel import make_mesh, shard_batch, shard_variables
from glfusion_tpu.train.metrics import overlap_metrics
from glfusion_tpu.train.step import make_eval_step, make_train_step
from glfusion_tpu.train.train_state import TrainState, make_optimizer
from glfusion_tpu.utils.checkpoint import CheckpointManager

# hard-coded reference eval split of the 10 test clips (main.py:423-424)
VAL_CLIPS = ["0_0", "0_2"]
TEST_CLIPS = ["0_1", "0_3", "0_4", "0_5", "0_6", "0_7", "0_8", "0_9"]


class Trainer:
    def __init__(self, cfg: Config, data_paths: Optional[Dict[str, str]] = None,
                 verbose: bool = True):
        self.cfg = cfg
        self.verbose = verbose
        # multi-host SPMD: every process runs the same loop on the same
        # (same-seed) data; only the lead process writes logs/summaries.
        # Batches stay host-side numpy so shard_batch can assemble global
        # arrays across processes (parallel/sharding.device_put_global).
        self._lead = jax.process_index() == 0
        self._stage = jnp.asarray if jax.process_count() == 1 else np.asarray
        self.mesh = make_mesh(data=cfg.train.mesh_data,
                              model=cfg.train.mesh_model)

        if data_paths is None:
            import tempfile
            from glfusion_tpu.data.synthetic import generate_synthetic_dataset
            tmp = tempfile.mkdtemp(prefix="glfusion_synth_")
            data_paths = generate_synthetic_dataset(
                tmp, cfg.data, views=cfg.model.views, seed=cfg.train.seed)
            self._log(f"synthetic dataset generated under {tmp}")
        self.data_paths = data_paths

        infos = load_infos(data_paths["infos"])
        unlab = load_infos(data_paths["unlab_infos"])
        self.test_infos = load_infos(data_paths["test_infos"])
        dl = Path(data_paths["data_list_dir"])
        self.train_list = load_split(dl / "train_list.npy")
        self.val_list = load_split(dl / "val_list.npy")
        self.test_list = load_split(dl / "test_list.npy")

        index = PatientIndex.from_infos(infos, cfg.data.use_data)
        unlab_index = PatientIndex.from_infos(unlab, cfg.data.use_data)
        self.train_loader = SegFrameLoader(index, self.train_list,
                                           cfg.model.views, cfg,
                                           is_train=True, seed=cfg.train.seed)
        self.valid_loader = SegFrameLoader(index, self.val_list,
                                           cfg.model.views, cfg,
                                           is_train=False, seed=cfg.train.seed)
        self.cycle_loader = AlignedClipLoader(unlab_index, self.train_list,
                                              cfg.model.views, cfg,
                                              seed=cfg.train.seed)

        from glfusion_tpu.models.registry import build_seg_model
        self.model, self._cps = build_seg_model(cfg.model)
        self.view_ids = view_ids_tuple(cfg.model.views)
        if cfg.train.cycle_light and (
                cfg.model.arch != "glfusion" or self._cps
                or cfg.model.variant in ("fg_bg", "local_only")):
            raise ValueError(
                "cycle_light requires the plain glfusion arch (non-CPS; "
                "not fg_bg/local_only, whose cycle features need the "
                "classifier heads): the fast cycle forward computes "
                "f4_global directly")
        if cfg.train.temporal and (cfg.model.arch != "glfusion"
                                   or self._cps):
            raise ValueError(
                "temporal (video attention on cycle clips) requires the "
                "plain glfusion arch: only GlobalAndLocal folds frames "
                "into the attention token axis (is_video)")
        if cfg.train.fuse_passes and (
                cfg.model.arch != "glfusion" or self._cps
                or cfg.model.variant in ("fg_bg", "local_only")):
            raise ValueError(
                "fuse_passes requires the plain glfusion arch (non-CPS; "
                "not fg_bg/local_only): the merged pass slices the head "
                "tail onto the supervised frames only")

        rng = jax.random.PRNGKey(cfg.train.seed)
        hw = cfg.data.crop_hw
        sample = jnp.zeros((cfg.model.num_views, 1, hw, hw, 1), jnp.float32)
        variables = jax.jit(
            lambda r: self.model.init(r, sample, False))(rng)
        variables = shard_variables(variables, self.mesh)

        # one optimizer update consumes batch_size·grad_accum frames/view
        # (TrainConfig.grad_accum) — the cosine schedule steps per UPDATE
        self.steps_per_epoch = max(
            len(self.train_loader)
            // (cfg.train.batch_size * cfg.train.grad_accum), 1)
        self.state = TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=make_optimizer(cfg, self.steps_per_epoch),
        )
        sup_model = None
        if cfg.model.remat and not cfg.train.remat_supervised:
            import dataclasses as _dc
            # no-remat twin for the supervised pass (same variable tree;
            # see TrainConfig.remat_supervised)
            sup_model, _ = build_seg_model(_dc.replace(
                cfg.model, remat=False, remat_stages=None))
        self.train_step = make_train_step(cfg, self.model,
                                          fuse_preprocess=True,
                                          cps=self._cps,
                                          sup_model=sup_model)
        self.eval_step = make_eval_step(cfg, self.model)
        # Base RNG for training-time randomness (augmentation crops,
        # dropout, cycle sampling). Step keys are DERIVED per (epoch, step)
        # via fold_in rather than split off a mutable stream, so the stream
        # is a pure function of (seed, epoch, step): a killed run resumed
        # from an epoch-boundary checkpoint replays the exact keys the
        # uninterrupted run would have used (tests/test_crash_resume.py
        # pins bitwise kill+resume == uninterrupted). The reference's
        # resume has no such property — it reseeds globally once
        # (loader.py:32-33) and its post-restore draws depend on how many
        # consumed the stream before the crash (main.py:823-855).
        self._base_rng = jax.random.PRNGKey(cfg.train.seed + 1)

        self.ckpt = CheckpointManager(cfg.train.save_dir,
                                      max_to_keep=cfg.train.ckpt_keep)
        # decoded test clips are static across epochs: cache them so the
        # per-epoch validations don't re-decode the same NIfTIs (~6k
        # decodes over a default 100-epoch run otherwise)
        from glfusion_tpu.data.pipeline import ByteLRU
        self._eval_clip_cache = ByteLRU(1 << 30)
        self.epoch = 0
        self._stop_requested = False
        log_dir = Path(cfg.train.log_dir)
        if self._lead:
            log_dir.mkdir(parents=True, exist_ok=True)
            self._metrics_file = open(log_dir / "metrics.jsonl", "a")
            from glfusion_tpu.utils.summary import SummaryWriter
            self.summary = SummaryWriter(str(log_dir))
        else:
            self._metrics_file = None
            self.summary = None

    # ------------------------------------------------------------------ api

    def request_stop(self) -> None:
        """Ask the epoch loop to stop at the next epoch boundary.

        The preemption hook: TPU-pod maintenance events and spot reclaims
        deliver SIGTERM with a short grace window; the CLI routes it here,
        so the run finishes the in-flight epoch, checkpoints it (even off
        the ``save_every`` cadence), flushes, and exits cleanly — a later
        ``--resume`` continues where it stopped. Signal-handler safe (only
        sets a flag). The reference has no graceful-shutdown story: a
        SIGTERM kills it mid-step, and its resume dropped optimizer state
        anyway (``main.py:869``).
        """
        self._stop_requested = True

    def load_latest(self) -> bool:
        restored = self.ckpt.restore_latest(self.state)
        if restored is None:
            return False
        self.state, self.epoch = restored
        self._log(f"restored checkpoint at epoch {self.epoch}")
        return True

    def load_torch_checkpoint(self, path: str) -> None:
        """Ingest a reference PyTorch ``net_XXXXX.pth`` (main.py:454-457).

        Converts the state dict (utils/torch_convert: per-view ModuleDict
        de-interleave → stacked-parameter axis) and replaces params +
        batch_stats, re-applying the mesh sharding rules. Optimizer state
        is untouched (the reference never saved it either, main.py:869).
        """
        if self.cfg.model.arch != "glfusion" or self._cps:
            raise ValueError("--torch-ckpt requires the plain glfusion arch "
                             "(the converter maps Global_and_Local's "
                             "state-dict names)")
        from glfusion_tpu.utils.torch_convert import load_torch_checkpoint

        converted = load_torch_checkpoint(path, self.cfg.model)
        converted = shard_variables(converted, self.mesh)
        self.state = self.state.replace(params=converted["params"],
                                        batch_stats=converted["batch_stats"])
        self._log(f"loaded + converted torch checkpoint {path}")

    def load_imagenet_backbone(self, path: str) -> None:
        """Start from an ImageNet-pretrained backbone, like the reference.

        The reference's ``_segm_model_iekd`` defaults to
        ``pretrained_backbone=True`` (models/segmentation.py:197-207), so
        its layer1..4 + bn1 come from torchvision's ImageNet resnet50 while
        the replaced conv1 (models/_utils.py:192) stays random; the per-view
        copies are identical (deep-copied template, ours.py:1724-1734).
        This overlays a local torchvision resnet50 state dict the same way
        (utils/imagenet_init) onto the initialized params/batch_stats and
        re-applies the mesh sharding rules.
        """
        if self.cfg.model.arch != "glfusion" or self._cps:
            raise ValueError("--imagenet-backbone requires the plain "
                             "glfusion arch (the mapping targets the "
                             "flagship's stacked-view backbone tree)")
        from glfusion_tpu.utils.imagenet_init import (load_imagenet_backbone,
                                                      merge_backbone)

        conv = load_imagenet_backbone(path, self.cfg.model)
        merged = {
            "params": merge_backbone(self.state.params, conv["params"]),
            "batch_stats": merge_backbone(self.state.batch_stats,
                                          conv["batch_stats"]),
        }
        merged = shard_variables(merged, self.mesh)
        self.state = self.state.replace(params=merged["params"],
                                        batch_stats=merged["batch_stats"])
        self._log(f"initialized backbone from ImageNet weights {path}")

    def train(self, num_epochs: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        num_epochs = num_epochs or cfg.train.num_epochs
        last = {}
        # overlap first-epoch ingest with the (minutes-long, full-size)
        # first train-step compile: a background thread pre-decodes the
        # epoch's corpus through the native reader into the LRU
        self.train_loader.warm_async(self.epoch)
        try:
            for epoch in range(self.epoch, num_epochs):
                self.epoch = epoch
                t0 = time.time()
                epoch_metrics = self._train_epoch(epoch)
                epoch_metrics["epoch_time_s"] = time.time() - t0
                last = epoch_metrics
                self._write_log({"epoch": epoch, **epoch_metrics})
                self._log(
                    f"epoch {epoch}: loss={epoch_metrics['loss']:.1f} "
                    f"seg={epoch_metrics['seg_loss']:.1f} "
                    f"cyc={epoch_metrics['cyc_loss']:.4f} "
                    f"dice={epoch_metrics['dice']:.4f} "
                    f"({epoch_metrics['epoch_time_s']:.1f}s)")
                if cfg.train.log_histograms:
                    self._log_param_histograms(epoch)
                # <= 0 means "never" (and avoids a ZeroDivisionError after
                # a full epoch of training)
                if (cfg.train.eval_every_epochs > 0
                        and (epoch + 1) % cfg.train.eval_every_epochs == 0):
                    self.validation_and_test()
                saved = (cfg.train.save_every_epochs > 0
                         and (epoch + 1) % cfg.train.save_every_epochs == 0)
                if saved:
                    self.ckpt.save(self.state, epoch)  # async; flushed below
                if self._stop_requested:
                    if not saved:  # make THIS epoch durable off-cadence
                        self.ckpt.save(self.state, epoch)
                    self._log(f"stop requested: checkpointed epoch {epoch}, "
                              "exiting")
                    break
        finally:
            self.train_loader.stop_warming()
            # flush even when an exception (OOM, Ctrl-C) escapes the epoch
            # loop — the last async checkpoint must become durable exactly
            # when the run dies
            self.ckpt.wait()
        return last

    def _train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        cycle_iter = None
        if cfg.train.use_cycle and len(self.cycle_loader) > 0:
            # peek: records may exist yet yield zero clips (every requested
            # view missing) — cycling an empty stream would raise a bare
            # StopIteration at the first next(); train without the cycle
            # loss instead. NOT itertools.cycle: it would retain every
            # yielded clip (each a fresh (V,T,H,W) array, ~1 GB over the
            # real corpus) on top of the loader's own byte-bounded cache —
            # restart the generator on exhaustion instead.
            gen = self.cycle_loader.clips(epoch)
            first = next(gen, None)
            if first is not None:
                def _restarting(g, head):
                    yield head
                    while True:
                        clip = next(g, None)
                        if clip is None:
                            g = self.cycle_loader.clips(epoch)
                            clip = next(g, None)
                            if clip is None:
                                return
                        yield clip

                cycle_iter = _restarting(gen, first)
        from glfusion_tpu.data.prefetch import prefetch

        # metrics accumulate ON DEVICE and transfer once per epoch: each
        # per-step host fetch is a full round trip, which dominates wall
        # time on high-latency transports (measured 50 s/step → ~0.5 s/step
        # on the remote TPU tunnel).
        agg = None
        steps = 0
        for host_batch in prefetch(
                self.train_loader.batches(
                    cfg.train.batch_size * cfg.train.grad_accum, epoch)):
            # stateless per-(epoch, step) key: resume-deterministic
            r_step = jax.random.fold_in(
                jax.random.fold_in(self._base_rng, epoch), steps)
            # raw batch; preprocessing runs inside the fused train step
            batch = {"images_raw": self._stage(host_batch["images_raw"]),
                     "masks_raw": self._stage(host_batch["masks_raw"])}
            if cycle_iter is not None:
                batch["clips"] = self._stage(next(cycle_iter))[..., None]
            batch = shard_batch(batch, self.mesh, batch_axis=1)
            self.state, metrics = self.train_step(self.state, batch, r_step)
            steps += 1
            agg = metrics if agg is None else jax.tree_util.tree_map(
                jnp.add, agg, metrics)
        # --checkify defers each step's error-throw by one step so the
        # fetch overlaps compute; surface the last pending one now
        flush = getattr(self.train_step, "checkify_flush", None)
        if flush is not None:
            flush()
        if agg is None:
            return {"loss": 0.0, "seg_loss": 0.0, "cyc_loss": 0.0, "dice": 0.0}
        agg = jax.device_get(agg)  # ONE transfer for the whole epoch
        counts = {k: float(np.asarray(agg[k]).sum())
                  for k in ("tp", "fp", "fn", "tn")}
        # plain-python arithmetic: wrapping the fetched counts back into
        # jnp would issue eager device dispatches per derived ratio
        derived = overlap_metrics(counts)
        return {
            "loss": float(agg["loss"]) / steps,
            "seg_loss": float(agg["seg_loss"]) / steps,
            "cyc_loss": float(agg["cyc_loss"]) / steps,
            "dice": float(derived["dice"]),
            "steps": steps,
        }

    def validation_and_test(self) -> Dict[str, dict]:
        """In-training eval over the fixed clip split (main.py:279-416),
        plus frame-level metrics over the val-split patients (the reference
        builds the same per-view val datasets at main.py:123-127; its second
        protocol over them, ``raw_data=False`` main.py:281-315, could never
        run — its data file is absent from the reference repo — so the
        frame-level eval here is the working equivalent)."""
        results = {}
        val_ids = [i for i in VAL_CLIPS if i in self.test_infos]
        test_ids = [i for i in TEST_CLIPS if i in self.test_infos]
        extra = sorted(set(self.test_infos) - set(VAL_CLIPS)
                       - set(TEST_CLIPS))
        if extra:
            # user-built test_infos (data/index_builder.py) with clip ids
            # outside the reference's 0_* split: assign them the same 2/8
            # proportions deterministically (sorted order) so no clip is
            # silently dropped from evaluation
            n_val = max(1, len(extra) // 5) if len(extra) > 1 else 0
            val_ids = val_ids + extra[:n_val]
            test_ids = test_ids + extra[n_val:]
            self._log(f"test_infos has {len(extra)} non-reference clip "
                      f"ids; derived Inner-val={val_ids} "
                      f"Inner-test={test_ids}")
        for name, ids in (("Inner-val", val_ids), ("Inner-test", test_ids)):
            if not ids:
                continue
            results[name] = self.evaluate_clips(ids, name)
        if len(self.valid_loader) > 0:
            results["Val-frames"] = self.evaluate_val_frames()
        return results

    def evaluate_val_frames(self, tag: str = "Val-frames") -> dict:
        """Frame-level eval over the val_list patients (labeled frames,
        deterministic center crop). Uses the same jitted eval step as the
        clip protocol; counts accumulate on device."""
        from glfusion_tpu.data.pipeline import preprocess_batch
        from glfusion_tpu.data.prefetch import prefetch

        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.train.seed)  # unused (is_train=False)
        acc = None
        frames = 0
        batches = 0
        for host_batch in prefetch(
                self.valid_loader.batches(cfg.train.batch_size)):
            pre = preprocess_batch(
                rng, self._stage(host_batch["images_raw"]),
                self._stage(host_batch["masks_raw"]),
                crop_hw=cfg.data.crop_hw, is_train=False,
                view_ids=self.view_ids)
            batch = shard_batch(pre, self.mesh, batch_axis=1)
            out = self.eval_step(self.state, batch)
            out = {"loss": out["loss"], "counts": out["counts"]}
            acc = out if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, out)
            frames += host_batch["images_raw"].shape[1]
            batches += 1
        if acc is None:
            return {"loss": 0.0, "frames": 0, "views": {}}
        acc = jax.device_get(acc)
        # mean per batch (the train-epoch loss is likewise mean per step)
        report = {"loss": float(acc["loss"]) / batches, "frames": frames,
                  "views": {}}
        for vi, view in enumerate(cfg.model.views):
            m = overlap_metrics({k: float(acc["counts"][k][vi])
                                 for k in acc["counts"]})
            report["views"][view] = {k: float(val) for k, val in m.items()}
            self._log(
                f"------ {tag} view {view} ------ "
                f"Dice {report['views'][view]['dice']:.4f} "
                f"PixelAcc {report['views'][view]['pixel_acc']:.4f} "
                f"({frames} frames)")
        self._write_log({"eval": tag, **{
            f"dice_{view}": report["views"][view]["dice"]
            for view in report["views"]}})
        return report

    def evaluate_clips(self, clip_ids, tag: str = "eval") -> dict:
        """Frames-as-batch clip evaluation (main.py:459-543)."""
        cfg = self.cfg
        v = cfg.model.num_views
        # accumulate on device; one transfer at the end (high-latency
        # transports make per-clip fetches the bottleneck)
        from glfusion_tpu.data.pipeline import MISS
        from glfusion_tpu.data.prefetch import prefetch

        def cached_clips():
            for cid in clip_ids:
                if cid not in self.test_infos:
                    continue
                clip = self._eval_clip_cache.get(cid)
                if clip is MISS:
                    loader = TestClipLoader(self.test_infos, [cid],
                                            cfg.model.views,
                                            cfg.data.clip_length)
                    clip = next(loader.clips(), None)
                    self._eval_clip_cache.put(cid, clip)
                if clip is not None:
                    yield clip

        acc = None
        nclips = 0
        for clip in prefetch(cached_clips()):
            batch = {"images": self._stage(clip["images"]),
                     "masks": self._stage(clip["masks"])}
            batch = shard_batch(batch, self.mesh, batch_axis=1)
            out = self.eval_step(self.state, batch)
            out = {"loss": out["loss"], "counts": out["counts"],
                   "part_counts": out["part_counts"]}
            acc = out if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, out)
            nclips += 1
        if acc is None:
            loss = 0.0
            totals = {k: np.zeros(v) for k in ("tp", "fp", "fn", "tn")}
            part_totals = {k: np.zeros((v, cfg.model.num_classes))
                           for k in ("tp", "fp", "fn", "tn")}
        else:
            acc = jax.device_get(acc)
            # mean per clip: comparable across differently-sized splits
            # (the train-epoch loss is likewise mean per step)
            loss = float(acc["loss"]) / nclips
            totals = {k: np.asarray(acc["counts"][k]) for k in acc["counts"]}
            part_totals = {k: np.asarray(acc["part_counts"][k])
                           for k in acc["part_counts"]}
        report = {"loss": loss, "clips": nclips, "views": {}}
        for vi, view in enumerate(cfg.model.views):
            # numpy in, numpy out — overlap_metrics is operator-only, so
            # host counts stay on host (no eager device round trips in the
            # report path)
            m = overlap_metrics({k: float(totals[k][vi]) for k in totals})
            parts = overlap_metrics({k: np.asarray(part_totals[k][vi])
                                     for k in part_totals})
            report["views"][view] = {
                **{k: float(val) for k, val in m.items()},
                "part_dice": [float(x) for x in np.asarray(parts["dice"])],
            }
            self._log(
                f"------ {tag} view {view} ------ "
                f"Dice {report['views'][view]['dice']:.4f} "
                f"PixelAcc {report['views'][view]['pixel_acc']:.4f} "
                f"Precision {report['views'][view]['precision']:.4f} "
                f"Recall {report['views'][view]['recall']:.4f} "
                f"parts {['%.3f' % p for p in report['views'][view]['part_dice']]}")
        self._write_log({"eval": tag, **{
            f"dice_{view}": report["views"][view]["dice"]
            for view in report["views"]}})
        return report

    def sweep_checkpoints(self, min_epoch: int = 50) -> dict:
        """Evaluate every saved checkpoint; report the best val epoch.

        Reference ``validation_and_test(net_root=...)`` (main.py:316-323)
        sweeps net_00000..net_00099.pth and picks the best Inner-val Dice at
        epoch ≥ 50 (main.py:414-416). Here: every Orbax step in save_dir.
        """
        steps = self.ckpt.all_steps()
        if not steps:
            self._log("no checkpoints to sweep")
            return {}
        best = {"epoch": None, "val_dice": -1.0, "test": None}
        # the epoch >= 50 rule only applies when some checkpoint satisfies
        # it; a short run (every step < min_epoch) sweeps everything
        apply_min = any(s >= min_epoch for s in steps)
        original = self.state
        original_epoch = self.epoch
        for step in steps:
            restored = self.ckpt.restore_step(self.state, step)
            if restored is None:
                continue
            self.state = restored
            self.epoch = step
            res = self.validation_and_test()
            val = res.get("Inner-val", {}).get("views", {})
            val_dice = (float(np.mean([v["dice"] for v in val.values()]))
                        if val else 0.0)
            self._log(f"sweep epoch {step}: val dice {val_dice:.4f}")
            if step >= min_epoch or not apply_min:
                if val_dice > best["val_dice"]:
                    best = {"epoch": step, "val_dice": val_dice,
                            "test": res.get("Inner-test")}
        self.state = original
        self.epoch = original_epoch
        if best["epoch"] is not None:
            self._log(f"best val epoch {best['epoch']} "
                      f"(dice {best['val_dice']:.4f})")
        return best

    def test_visualize(self, method_name: str = "glfusion_tpu",
                       out_dir: str = "./visualze_for_ppt") -> int:
        """Write per-frame colorized prediction PNGs (main.py:546-648).

        Runs the model over all 10 test clips and saves
        ``<out>/<method>/192_data/<patient>/<view>/pred_<t>.png``; returns the
        total number of PNGs written.
        """
        from glfusion_tpu.utils.visualize import save_clip_visualization

        cfg = self.cfg
        ids = sorted(self.test_infos.keys())
        loader = TestClipLoader(self.test_infos, ids, cfg.model.views,
                                cfg.data.clip_length)
        written = 0
        for clip in loader.clips():
            batch = {"images": self._stage(clip["images"]),
                     "masks": self._stage(clip["masks"])}
            batch = shard_batch(batch, self.mesh, batch_axis=1)
            out = self.eval_step(self.state, batch)
            logits = self._fetch(out["logits"])  # (V, T, H, W, 5)
            if self._lead:  # one writer in multi-host runs
                for vi, view in enumerate(cfg.model.views):
                    written += save_clip_visualization(
                        out_dir, method_name, clip["clip_id"], view,
                        logits[vi])
            self._log(f"patient {clip['clip_id']} pred finished")
        return written

    def infer(self, out_dir: str = "./predictions") -> int:
        """Serving path: run every test clip and write predicted masks.

        Writes per-clip, per-view binary 5-ch masks as NIfTI
        (``pred_<clip>_v<view>.nii.gz``, (5, H, W, T) uint8 — the
        ``Test_Seg_PAHDataset`` label layout) so downstream consumers of the
        reference's data contract can read predictions like labels.
        Returns the number of files written.
        """
        from glfusion_tpu.data.nifti import write_nifti

        cfg = self.cfg
        ids = sorted(self.test_infos.keys())
        loader = TestClipLoader(self.test_infos, ids, cfg.model.views,
                                cfg.data.clip_length)
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        written = 0
        for clip in loader.clips():
            batch = {"images": self._stage(clip["images"]),
                     "masks": self._stage(clip["masks"])}
            batch = shard_batch(batch, self.mesh, batch_axis=1)
            res = self.eval_step(self.state, batch)
            pred = self._fetch(res["logits"]) > 0.0  # sigmoid > 0.5
            if self._lead:  # one writer in multi-host runs
                for vi, view in enumerate(cfg.model.views):
                    # (T, H, W, 5) → (5, H, W, T) uint8
                    vol = np.transpose(pred[vi], (3, 1, 2, 0)).astype(
                        np.uint8)
                    write_nifti(
                        out / f"pred_{clip['clip_id']}_v{view}.nii.gz", vol)
                    written += 1
            self._log(f"clip {clip['clip_id']} predicted")
        return written

    # ---------------------------------------------------------------- utils

    def _log_param_histograms(self, epoch: int) -> None:
        """Per-parameter TensorBoard histograms (the reference's optional
        ``add_summary`` histogram pass, main.py:252-255). Opt-in
        (``--log-histograms``): the fetch is the full parameter tree.
        Every rank fetches (``_fetch`` is a collective when shards span
        processes); only the lead rank writes."""
        from jax.tree_util import keystr, tree_flatten_with_path

        # ONE transfer for the whole tree: per-leaf fetches are hundreds of
        # serialized round trips on high-latency transports
        if jax.process_count() == 1:
            host = jax.device_get(self.state.params)
        else:
            from jax.experimental import multihost_utils
            host = multihost_utils.process_allgather(self.state.params,
                                                     tiled=True)
        if not (self._lead and self.summary is not None):
            return
        for path, vals in tree_flatten_with_path(host)[0]:
            self.summary.add_histogram("params" + keystr(path), vals, epoch)

    def _fetch(self, x) -> np.ndarray:
        """Full host value of a possibly process-spanning sharded array.

        ``np.asarray`` on a jax.Array raises when shards live on another
        process's devices; ``process_allgather`` (a collective — every
        process must call it) assembles the full value on every host.
        """
        if jax.process_count() == 1:
            return np.asarray(x)
        from jax.experimental import multihost_utils
        return multihost_utils.process_allgather(x, tiled=True)

    def _log(self, msg: str):
        if self.verbose and self._lead:
            print(f"[glfusion] {msg}", flush=True)

    def _write_log(self, record: dict):
        if not self._lead:
            return
        self._metrics_file.write(json.dumps(record) + "\n")
        self._metrics_file.flush()
        # mirror numeric fields to TensorBoard (reference add_summary,
        # main.py:874-883)
        for k, v in record.items():
            if isinstance(v, (int, float)) and k != "epoch":
                self.summary.add_scalar(k, v, self.epoch)
