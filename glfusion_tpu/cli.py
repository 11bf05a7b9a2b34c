"""Command-line entry point — reference ``main.py --mode {train,val,visual}``.

The reference's only flag is ``--mode`` (``main.py:896-898``); every other
knob lives in an inline config dict (``main.py:909-949``). Here the same
knobs are proper flags over the dataclass config, with the reference's
values as defaults. Without ``--data-root`` a synthetic dataset exercises
the full pipeline (the real corpus is private to the reference authors).
"""

from __future__ import annotations

import argparse
import dataclasses

from glfusion_tpu.config import Config, tiny_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="glfusion_tpu",
        description="GL-Fusion multi-view echocardiogram segmentation (TPU)")
    p.add_argument("--mode",
                   choices=["train", "val", "visual", "infer", "serve",
                            "export", "reg-train", "reg-val"],
                   default="train",
                   help="reference main.py:896-898; reg-* drive the mPAP "
                        "video-regression path (reference PAHDataset + "
                        "Resnet50PAH, which its entry point never wires); "
                        "serve = infer through the pipelined serving path "
                        "(decode ‖ compute ‖ fetch, glfusion_tpu/serve.py); "
                        "export = save the serving forward as a "
                        "self-contained StableHLO artifact "
                        "(utils/model_export.py)")
    p.add_argument("--data-root", default=None,
                   help="dataset root containing infos/, data_list/, .nii.gz;"
                        " omit to run on synthetic data")
    # None sentinels: "explicitly passed" must be distinguishable from
    # "left at default", or --tiny would override a user's explicit value
    # that happens to equal the full-size default (e.g. --tiny --epochs 100)
    p.add_argument("--batch-size", type=int, default=None,
                   help="default 8 (reference main.py:914); --tiny has its "
                        "own miniature default")
    p.add_argument("--epochs", type=int, default=None,
                   help="default 100 (reference main.py:916)")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--weight-decay", type=float, default=1e-5)
    p.add_argument("--views", default="1,3,4",
                   help="comma-separated view ids (reference main.py:918)")
    from glfusion_tpu.arch_names import SEG_ARCHS
    p.add_argument("--model", default="glfusion",
                   choices=list(SEG_ARCHS),
                   help="trainable architecture (models/registry.py): the "
                        "flagship, the baselines, the AVS family "
                        "(avs_baseline/avs_transfusion/avs_model17/"
                        "avs_pred_endecoder) and the legacy model3..21 "
                        "family (legacy:<kind>); the reference can only "
                        "train Global_and_Local")
    p.add_argument("--reg-model", default="resnet50pah",
                   choices=["resnet50pah", "r2plus1d", "timesformer",
                            "resnet50pfs"],
                   help="regression architecture for --mode reg-*")
    p.add_argument("--label-type", default="mPAP", choices=["mPAP", "Vmax"],
                   help="regression target column (reference loader.py:140)")
    p.add_argument("--variant", default="global_and_local",
                   choices=["global_and_local", "global_only", "local_only",
                            "cyc_nofusion", "global_only_cyc_nofusion",
                            "conv_merge", "fg_bg",
                            "early_fusion", "late_fusion", "cps",
                            "temporal"],
                   help="'temporal' = Global_and_Local_Temporal intent "
                        "(reference ours.py:1846): cycle clips run video "
                        "attention over T·V·h·w tokens")
    p.add_argument("--clip-length", type=int, default=None,
                   help="default 40 (reference main.py:917)")
    p.add_argument("--no-cycle", action="store_true",
                   help="disable the temporal cycle-consistency loss")
    p.add_argument("--dense-cyc", action="store_true",
                   help="use dense_seg_cycle (reference main.py:719)")
    p.add_argument("--cycle-light", action="store_true",
                   help="cycle forward computes only the cycle-loss "
                        "features (identical loss; skipped heads' BN stats "
                        "stop updating on cycle frames)")
    p.add_argument("--fuse-passes", action="store_true",
                   help="run the supervised batch and cycle clip through "
                        "ONE merged backbone pass per step (cycle-light "
                        "head semantics; merged-batch BN moments — see "
                        "TrainConfig.fuse_passes)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="gradient accumulation: one Adam update per this "
                        "many supervised microbatches of --batch-size "
                        "(exact big-batch gradient under the sum-reduction "
                        "loss; cycle clip once per update — see "
                        "TrainConfig.grad_accum)")
    p.add_argument("--save-dir", default="./result/ckpt")
    p.add_argument("--log-dir", default="./result/log_info/log_01")
    p.add_argument("--resume", action="store_true",
                   help="restore latest checkpoint before training"
                        " (reference is_load, main.py:74)")
    p.add_argument("--torch-ckpt", default=None,
                   help="load a reference PyTorch .pth checkpoint (converted "
                        "via utils/torch_convert) instead of an Orbax one — "
                        "the reference eval loads net_XXXXX.pth the same way "
                        "(main.py:454-457); glfusion arch only")
    p.add_argument("--imagenet-backbone", default=None,
                   help="initialize the backbone from a LOCAL torchvision "
                        "resnet50 ImageNet .pth (the reference recipe: "
                        "pretrained_backbone=True default, "
                        "segmentation.py:197-207, conv1 replaced "
                        "_utils.py:192); glfusion arch only")
    p.add_argument("--out-dir", default="./predictions",
                   help="infer-mode output directory for predicted masks")
    p.add_argument("--method-name", default="glfusion_tpu",
                   help="visual-mode output subdirectory (main.py:546)")
    p.add_argument("--tiny", action="store_true",
                   help="miniature topology for smoke runs")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="model-parallel mesh axis size")
    p.add_argument("--sweep", action="store_true",
                   help="val mode: evaluate EVERY saved checkpoint and report"
                        " the best val epoch (reference main.py:316-323)")
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                   help="compute dtype (params stay f32). The reference is "
                        "f32; bfloat16 halves activation HBM — required to "
                        "fit full-size training on one 16 GB v5e chip")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone blocks (saves activation "
                        "HBM at ~30%% extra FLOPs)")
    p.add_argument("--eval-every", type=int, default=1,
                   help="epochs between in-training validations")
    p.add_argument("--save-every", type=int, default=1,
                   help="epochs between checkpoints")
    p.add_argument("--ckpt-keep", type=int, default=None,
                   help="checkpoints retained on disk (default: all, the "
                        "reference contract — its sweep picks the best "
                        "epoch >=50 over every saved net_NNNNN.pth)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (the anomaly-detection "
                        "analogue of the reference's "
                        "torch.autograd.set_detect_anomaly, main.py:37)")
    p.add_argument("--checkify", action="store_true",
                   help="checkify finiteness checks on loss + grad norm "
                        "inside the compiled train step (jit-compatible "
                        "anomaly detection: divergence raises host-side "
                        "one step after the offending step — throws are "
                        "deferred by one step so the error fetch overlaps "
                        "compute instead of serializing dispatch)")
    p.add_argument("--log-histograms", action="store_true",
                   help="per-parameter TensorBoard histograms each epoch "
                        "(the reference's optional add_summary histogram "
                        "pass, main.py:252-255; costs a full param "
                        "device-to-host fetch per epoch)")
    p.add_argument("--serve-depth", type=int, default=2,
                   help="--mode serve: clips kept in flight on device "
                        "(more hides decode latency, costs HBM)")
    p.add_argument("--serve-threads", type=int, default=None,
                   help="--mode serve: host NIfTI decode workers "
                        "(default: min(4, cpu_count) — serving is "
                        "host-decode-bound, tools/bench_serve_latency.py)")
    p.add_argument("--http-port", type=int, default=None,
                   help="--mode serve: start an online HTTP inference "
                        "endpoint on this port (POST /predict, GET "
                        "/healthz; glfusion_tpu/http_serve.py) instead of "
                        "batch-serving the test corpus")
    p.add_argument("--http-host", default="127.0.0.1",
                   help="--http-port bind address (0.0.0.0 to expose)")
    p.add_argument("--export-dir", default="./exported",
                   help="--mode export: output directory for the AOT "
                        "serving artifact (serving_fn.jaxexp + meta.json)")
    p.add_argument("--export-platforms", default="cpu,tpu",
                   help="--mode export: comma-separated lowering platforms "
                        "baked into the artifact")
    p.add_argument("--export-hw", type=int, default=None,
                   help="--mode export: pinned spatial size of the "
                        "artifact (default: the configured crop size; the "
                        "frame axis is symbolic but H=W cannot be)")
    p.add_argument("--from-export", default=None,
                   help="--mode serve: run a saved AOT artifact "
                        "(--mode export output) instead of the live "
                        "checkpoint weights")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="pin the JAX backend (overrides autodetection; "
                        "useful when a site-level jax import has already "
                        "fixed the platform before JAX_PLATFORMS is read)")
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    from glfusion_tpu.config import ALL_VIEWS

    cfg = tiny_config() if args.tiny else Config()
    # 'temporal' is a TRAIN-side switch on the plain model (the cycle
    # forward folds frames into attention tokens), not a graph variant
    temporal = args.variant == "temporal"
    variant = "global_and_local" if temporal else args.variant
    views = tuple(args.views.split(","))
    bad = [v for v in views if v not in ALL_VIEWS]
    if bad:
        raise SystemExit(
            f"error: --views contains unknown view id(s) {bad}; "
            f"valid ids are {list(ALL_VIEWS)}")
    # --tiny supplies small defaults but explicit flags still win
    # None = not passed → keep cfg's default (tiny_config's miniature value
    # under --tiny, the reference literal otherwise)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, views=views, variant=variant, arch=args.model,
            dtype=(args.dtype or cfg.model.dtype),
            remat=args.remat or cfg.model.remat),
        data=dataclasses.replace(cfg.data, root=args.data_root,
                                 clip_length=(
                                     args.clip_length
                                     if args.clip_length is not None
                                     else cfg.data.clip_length)),
        opt=dataclasses.replace(cfg.opt, lr=args.lr,
                                weight_decay=args.weight_decay),
        train=dataclasses.replace(
            cfg.train,
            batch_size=(args.batch_size
                        if args.batch_size is not None
                        else cfg.train.batch_size),
            num_epochs=(args.epochs
                        if args.epochs is not None
                        else cfg.train.num_epochs),
            use_cycle=not args.no_cycle,
            dense_cyc=args.dense_cyc,
            cycle_light=args.cycle_light,
            fuse_passes=args.fuse_passes,
            grad_accum=args.grad_accum,
            temporal=temporal,
            save_dir=args.save_dir,
            log_dir=args.log_dir,
            test_views=views,
            eval_every_epochs=args.eval_every,
            save_every_epochs=args.save_every,
            ckpt_keep=args.ckpt_keep,
            mesh_model=args.mesh_model,
            log_histograms=args.log_histograms,
            checkify=args.checkify,
        ),
    )
    return cfg


def _run_regression(args, cfg, data_paths) -> int:
    """--mode reg-train / reg-val: the mPAP video-regression path."""
    import json

    from glfusion_tpu.models.registry import build_reg_model
    from glfusion_tpu.train.regression import RegressionTrainer

    if data_paths is None:
        import tempfile
        from glfusion_tpu.data.synthetic import generate_synthetic_dataset
        tmp = tempfile.mkdtemp(prefix="glfusion_synth_")
        data_paths = generate_synthetic_dataset(
            tmp, cfg.data, views=cfg.model.views, seed=cfg.train.seed)
        print(f"[glfusion] synthetic dataset generated under {tmp}",
              flush=True)

    # --tiny: miniature topologies for smoke runs (mirrors tiny_config)
    tiny_kw = {
        "resnet50pah": dict(depth=10),
        "r2plus1d": dict(layers=(1, 1, 1, 1), widths=(8, 16, 32, 64)),
        "timesformer": dict(dim=32, depth=1, heads=2, dim_head=16,
                            patch_size=8),
        "resnet50pfs": dict(main_depth=10, proj_depth=10,
                            widths=(8, 16, 32, 64)),
    }
    overrides = tiny_kw[args.reg_model] if args.tiny else {}
    model, adapter = build_reg_model(args.reg_model, cfg.model.num_views,
                                     dtype=cfg.model.dtype, **overrides)
    trainer = RegressionTrainer(cfg, model, data_paths,
                                label_type=args.label_type,
                                input_adapter=adapter)
    if args.mode == "reg-train":
        if args.resume and trainer.load_latest():
            print(f"[glfusion] resumed at epoch {trainer.epoch}", flush=True)
        for epoch in range(trainer.epoch, cfg.train.num_epochs):
            m = trainer.train_epoch(epoch)
            print(f"[glfusion] reg epoch {epoch}: loss={m['loss']:.4f} "
                  f"({m['steps']} steps)", flush=True)
            if (cfg.train.save_every_epochs > 0
                    and (epoch + 1) % cfg.train.save_every_epochs == 0) \
                    or epoch == cfg.train.num_epochs - 1:
                trainer.save(epoch)
        trainer.ckpt.wait()
    else:  # reg-val scores the newest checkpoint, not fresh init
        if not trainer.load_latest():
            print("[glfusion] reg-val: no checkpoint found under "
                  f"{cfg.train.save_dir}; evaluating fresh init", flush=True)
    import math
    metrics = trainer.evaluate()
    # strict JSON: r2 is undefined (±inf) for a single-sample val split
    metrics = {k: (v if isinstance(v, (int, float)) and math.isfinite(v)
                   else None) for k, v in metrics.items()}
    print(json.dumps({"label": args.label_type, **metrics}))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform is not None:
        import jax
        jax.config.update("jax_platforms", args.platform)
    # multi-host bring-up BEFORE any other backend use: under an MPI-style
    # launcher (PMI_SIZE/OMPI_COMM_WORLD_SIZE set) every process joins the
    # jax.distributed runtime and the Trainer runs multi-host SPMD — the
    # functional version of the reference's dormant spawn scaffolding
    # (main.py:951-963). No-op for ordinary single-process runs.
    from glfusion_tpu.utils.cluster import initialize_distributed
    initialize_distributed()
    if args.debug_nans:
        from glfusion_tpu.utils.profiling import debug_nans
        debug_nans(True)
    cfg = config_from_args(args)

    data_paths = None
    if args.data_root is not None:
        from pathlib import Path
        root = Path(args.data_root)
        data_paths = {
            "infos": str(root / cfg.data.infos_path),
            "unlab_infos": str(root / cfg.data.unlab_infos_path),
            "test_infos": str(root / cfg.data.test_infos_path),
            "data_list_dir": str(root / cfg.data.data_list_dir),
        }
        missing = [p for p in data_paths.values() if not Path(p).exists()]
        if missing:
            raise SystemExit(
                "error: --data-root is missing required entries "
                f"(reference on-disk contract):\n  " + "\n  ".join(missing))

    if args.mode in ("reg-train", "reg-val"):
        return _run_regression(args, cfg, data_paths)

    if args.imagenet_backbone is not None and args.torch_ckpt is not None:
        raise SystemExit("error: --imagenet-backbone is an initialization; "
                         "--torch-ckpt loads a full checkpoint — pick one")

    from glfusion_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, data_paths=data_paths)
    if args.imagenet_backbone is not None:
        trainer.load_imagenet_backbone(args.imagenet_backbone)
    restored = False
    if args.torch_ckpt is not None:
        trainer.load_torch_checkpoint(args.torch_ckpt)
        restored = True
    elif args.mode == "serve" and args.from_export is not None:
        # the AOT artifact carries its own weights; skip the (possibly
        # multi-GB) live-checkpoint restore entirely
        pass
    elif args.resume or args.mode in ("val", "visual", "infer", "serve",
                                      "export"):
        restored = trainer.load_latest()
    if args.mode == "export" and not restored:
        raise SystemExit(
            "error: --mode export found no weights to bake into the "
            "artifact (no checkpoint under --save-dir and no --torch-ckpt);"
            " exporting a random-init model is never what you want")
    if (args.mode == "serve" and args.from_export is None
            and not restored):
        # same guard as export: a serving endpoint that comes up healthy
        # on random-init weights returns garbage masks with no warning
        raise SystemExit(
            "error: --mode serve found no weights (no checkpoint under "
            "--save-dir, no --torch-ckpt, no --from-export); train first "
            "or point at a checkpoint/export")

    if args.mode == "train":
        # Preemption-graceful training: TPU-pod maintenance/spot reclaims
        # deliver SIGTERM with a grace window — finish the in-flight
        # epoch, checkpoint it, flush, exit 0 (Trainer.request_stop).
        import signal
        import threading
        if threading.current_thread() is threading.main_thread():
            prev = signal.signal(signal.SIGTERM,
                                 lambda signum, frame: trainer.request_stop())
            try:
                trainer.train()
            finally:
                signal.signal(signal.SIGTERM, prev)
        else:  # signal.signal is main-thread-only (in-process test drivers)
            trainer.train()
    elif args.mode == "infer":
        n = trainer.infer(out_dir=args.out_dir)
        print(f"wrote {n} prediction volumes")
    elif args.mode == "export":
        from glfusion_tpu.utils.model_export import (export_serving_forward,
                                                     save_exported)
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        platforms = tuple(p.strip() for p in args.export_platforms.split(",")
                          if p.strip())
        exported = export_serving_forward(cfg, trainer.model, variables,
                                          platforms=platforms,
                                          hw=args.export_hw)
        meta = save_exported(exported, args.export_dir, cfg)
        print(f"exported serving forward to {args.export_dir} "
              f"({meta['serialized_bytes']} bytes, "
              f"platforms {meta['platforms']}, symbolic frame axis)")
    elif args.mode == "serve" and args.http_port is not None:
        from glfusion_tpu.http_serve import serve_http
        serve_http(trainer, host=args.http_host, port=args.http_port,
                   from_export=args.from_export)
    elif args.mode == "serve":
        from glfusion_tpu.serve import serve_test_clips
        import os as _os
        stats = serve_test_clips(
            trainer, out_dir=args.out_dir,
            depth=args.serve_depth,
            threads=args.serve_threads or min(4, _os.cpu_count() or 1),
            from_export=args.from_export)
        print(f"served {stats['clips']} clips "
              f"({stats['clips_per_s']} clips/s, {stats['wall_s']} s): "
              f"wrote {stats['written']} prediction volumes")
    elif args.mode == "val":
        if args.sweep:
            trainer.sweep_checkpoints()
        else:
            trainer.validation_and_test()
    elif args.mode == "visual":
        n = trainer.test_visualize(method_name=args.method_name)
        print(f"wrote {n} prediction frames")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
