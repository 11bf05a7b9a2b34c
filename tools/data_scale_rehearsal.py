#!/usr/bin/env python
"""Data-stage rehearsal at real-corpus scale (VERDICT r1 item 9).

The real corpus is 178 train patients × 3 views of ~800×600×127 echo video
(.nii.gz). This tool writes N such videos (synthetic speckle), then
measures the host data stage against the train-step compute bound:

  * cold decode+resize throughput (native batch reader, per thread count)
  * steady-state (LRU-cached) batch assembly latency
  * extrapolated first-epoch ingest time for 178×3 videos vs the
    89-step × measured-step-time compute bound

Writes nothing outside --workdir. Numbers go to BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_video(rs: np.random.RandomState, h: int, w: int, t: int):
    """Speckle-ish uint8 echo video (gzip ratio comparable to real echo)."""
    base = rs.randint(0, 180, (h, w, 1), np.uint8)
    noise = rs.randint(0, 70, (h, w, t), np.uint8)
    return (base + noise).astype(np.uint8)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/gl_scale")
    ap.add_argument("--videos", type=int, default=12)
    ap.add_argument("--hwt", default="800,600,127")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--step-seconds", type=float, default=0.34,
                    help="measured train-step compute bound (BASELINE.md)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    h, w, t = (int(x) for x in args.hwt.split(","))
    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)

    from glfusion_tpu.data.nifti import write_nifti
    from glfusion_tpu.data.pipeline import _resize_nearest_np

    rs = np.random.RandomState(0)
    paths = []
    t0 = time.time()
    for i in range(args.videos):
        p = work / f"v{i:03d}.nii.gz"
        if not p.exists():
            write_nifti(p, synth_video(rs, h, w, t))
        paths.append(p)
    gen_s = time.time() - t0
    size_mb = sum(p.stat().st_size for p in paths) / 1e6
    out = {"videos": args.videos, "shape": [h, w, t],
           "gen_s": round(gen_s, 1),
           "disk_mb_per_video": round(size_mb / args.videos, 1)}

    # cold decode throughput: native batch reader at several thread counts
    from glfusion_tpu.native import native_available, read_nifti_batch_native
    out["native_available"] = native_available()
    if native_available():
        for threads in (1, 2, 4, 8):
            t0 = time.time()
            vols = read_nifti_batch_native(paths, num_threads=threads)
            dt = time.time() - t0
            out[f"decode_videos_per_s_t{threads}"] = round(
                args.videos / dt, 2)
        del vols

    # decode + host nearest-resize to 144² (the cached entry shape)
    from glfusion_tpu.data.nifti import read_nifti
    t0 = time.time()
    n_pipe = min(args.videos, 6)
    for p in paths[:n_pipe]:
        vol = np.asarray(read_nifti(p))
        _ = _resize_nearest_np(vol, (144, 144))
    pipe_s = (time.time() - t0) / n_pipe
    out["decode_resize_s_per_video"] = round(pipe_s, 3)

    # extrapolation: first epoch must ingest 178×3 videos once (then the
    # byte-bounded LRU holds every 144² entry: 178×3×144²×127B ≈ 1.4 GB)
    total_videos = 178 * args.views
    ingest_s = total_videos * pipe_s
    compute_s = 89 * args.step_seconds
    out["first_epoch_ingest_s_1thread"] = round(ingest_s, 1)
    rates = [v for k, v in out.items()
             if k.startswith("decode_videos_per_s_t") and v]
    if rates:
        # best thread count for the decode; the 144² resize is ~5% of the
        # decode cost and stays serial
        resize_s = max(pipe_s - 1 / out["decode_videos_per_s_t1"], 0.0)
        out["first_epoch_ingest_s_best_threads"] = round(
            total_videos * (1 / max(rates) + resize_s), 1)
    out["epoch_compute_s"] = round(compute_s, 1)
    out["steady_state_bound"] = (
        "compute" if compute_s > 0.5 else "unknown")

    # steady-state: batch assembly from a warm cache (crop/normalize is on
    # device; host only gathers frames from cached resized videos)
    cache = {p: _resize_nearest_np(
        np.asarray(read_nifti(p)), (144, 144)) for p in paths[:n_pipe]}
    t0 = time.time()
    reps = 50
    for i in range(reps):
        sel = rs.randint(0, n_pipe, args.batch * args.views)
        frames = np.stack([
            list(cache.values())[s][:, :, rs.randint(0, t)] for s in sel])
        frames = frames.reshape(args.views, args.batch, 144, 144)
    warm_s = (time.time() - t0) / reps
    out["warm_batch_assembly_s"] = round(warm_s, 4)
    out["input_bound_steady_state"] = bool(warm_s > args.step_seconds)

    print("DATASCALE " + json.dumps(out))
    if not args.keep:
        shutil.rmtree(work)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
