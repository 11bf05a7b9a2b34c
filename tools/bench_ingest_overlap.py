#!/usr/bin/env python
"""Measure first-epoch ingest overlap with compilation (VERDICT r2 #7).

The reference's MONAI DataLoader decodes in worker processes but only
``num_workers`` batches ahead (``main.py:135-145``); this rebuild's
equivalent finding was that the whole first-epoch ingest (321 s at real
corpus scale, BASELINE.md) ran serial to the minutes-long first XLA
compile. ``SegFrameLoader.warm_async`` (wired in ``Trainer.fit``) walks
the epoch's access order through the native thread-pool reader in a
daemon thread so decode proceeds WHILE the main thread is blocked in the
first train-step compile.

This tool measures the mechanism at corpus-scale video shapes:

  arm A (serial baseline): cold LRU → time a full epoch-key prefill.
  arm B (overlap):         cold LRU → start ``warm_async`` → block the
       main thread for a "compile window" (default = arm A's duration;
       a C-level sleep, releasing the GIL exactly as XLA's compile does)
       → time the RESIDUAL ingest of the same epoch keys.

hidden_frac = 1 − residual/serial is the fraction of first-epoch ingest
hidden behind a compile at least as long as the ingest. Numbers go to
BASELINE.md's data-stage table.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_loader(root, cfg, ids, views):
    from glfusion_tpu.data.infos import PatientIndex, load_infos
    from glfusion_tpu.data.pipeline import SegFrameLoader

    infos = load_infos(root / "infos" / "save_infos_reg_v2.npy")
    index = PatientIndex.from_infos(infos, cfg.data.use_data)
    return SegFrameLoader(index, ids, views, cfg, is_train=True)


def timed_prefill(loader, keys, chunk=8):
    t0 = time.perf_counter()
    for i in range(0, len(keys), chunk):
        loader._prefill(keys[i:i + chunk])
    return time.perf_counter() - t0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/gl_overlap")
    ap.add_argument("--patients", type=int, default=12)
    ap.add_argument("--raw-hw", type=int, default=700,
                    help="square video side; 700²×127 ≈ the real corpus's "
                         "800×600×127 voxel count")
    ap.add_argument("--frames", type=int, default=127)
    ap.add_argument("--window", type=float, default=None,
                    help="compile-window seconds (default: arm A's time)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args(argv)

    from glfusion_tpu.config import Config
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset

    cfg = Config()
    dcfg = replace(cfg.data,
                   synthetic_num_patients=args.patients,
                   synthetic_raw_hw=args.raw_hw,
                   synthetic_num_frames=args.frames)
    cfg = replace(cfg, data=dcfg)
    views = tuple(cfg.model.views)

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    generate_synthetic_dataset(work, dcfg, views=views)
    gen_s = time.perf_counter() - t0
    import numpy as np
    ids = list(np.load(work / "data_list" / "train_list.npy"))
    n_videos = args.patients * len(views)
    disk_mb = sum(p.stat().st_size
                  for p in (work / "nii").glob("*.nii.gz")) / 1e6

    out = {"videos": n_videos,
           "shape": [args.raw_hw, args.raw_hw, args.frames],
           "disk_mb_per_video": round(disk_mb / max(n_videos, 1), 1),
           "gen_s": round(gen_s, 1)}

    # arm A: serial ingest, cold cache
    loader_a = build_loader(work, cfg, ids, views)
    keys = loader_a.epoch_keys(0)
    serial_s = timed_prefill(loader_a, keys)
    out["serial_ingest_s"] = round(serial_s, 2)
    del loader_a

    # arm B: warm_async + compile window + residual ingest
    window = args.window if args.window is not None else serial_s
    loader_b = build_loader(work, cfg, ids, views)
    t = loader_b.warm_async(epoch=0)
    time.sleep(window)  # the "compile": GIL released, warm thread decodes
    with loader_b._cache_lock:
        out["cached_at_window_end"] = len(loader_b._cache)
        out["warm_thread_alive"] = bool(t is not None and t.is_alive())
    residual_s = timed_prefill(loader_b, keys)
    loader_b.stop_warming()
    if t is not None:
        t.join(timeout=5)
    out["window_s"] = round(window, 2)
    out["residual_ingest_s"] = round(residual_s, 2)
    out["hidden_frac"] = round(1.0 - residual_s / serial_s, 3)
    out["first_epoch_delta_s"] = round(serial_s - residual_s, 2)

    print("INGEST_OVERLAP " + json.dumps(out))
    if not args.keep:
        shutil.rmtree(work)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
