#!/usr/bin/env python
"""Serial vs pipelined clip serving throughput (glfusion_tpu/serve.py).

Builds a synthetic test-clip corpus on disk (the reference Test_Seg
contract), then serves it twice with identical decode + forward:

  serial    — decode, forward, fetch, one clip at a time (Trainer.infer's
              structure)
  pipelined — ClipPipeline: decode thread pool ‖ `depth` clips in flight
              on device ‖ uint8-mask fetch

Reports clips/s for both and the speedup. Numbers go to BASELINE.md.
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

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/gl_serve")
    ap.add_argument("--clips", type=int, default=20)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute dtype for the served forward (params "
                         "stay f32); the CLI exposes the same knob")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from glfusion_tpu.config import Config
    from glfusion_tpu.data.infos import load_infos
    from glfusion_tpu.data.nifti import write_nifti
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.serve import ClipPipeline

    cfg = Config()
    cfg = replace(cfg, model=replace(cfg.model, dtype=args.dtype))
    views = tuple(cfg.model.views)
    hw, t = cfg.data.crop_hw, cfg.data.clip_length

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    # synthetic corpus gives 10 test clips; replicate paths to args.clips
    generate_synthetic_dataset(
        work, replace(cfg.data, synthetic_num_patients=2,
                      synthetic_raw_hw=hw, synthetic_num_frames=t),
        views=views)
    infos = load_infos(work / "infos" / "test_infos.npy")
    base = [(cid, dict(rec["views_images"]))
            for cid, rec in sorted(infos.items())]
    clips = [(f"{i}_{cid}", paths)
             for i, (cid, paths) in enumerate(
                 (base * (args.clips // len(base) + 1))[:args.clips])]

    model = GlobalAndLocal(cfg.model)
    sample = jnp.zeros((len(views), t, hw, hw, 1), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, sample, False))(
        jax.random.PRNGKey(0))

    pipe = ClipPipeline(cfg, model, variables,
                        depth=args.depth, threads=args.threads)

    out = {"clips": args.clips, "depth": args.depth,
           "threads": args.threads, "dtype": args.dtype,
           "platform": jax.devices()[0].platform}
    # warm the compiled forward (shared by both arms)
    next(iter(pipe.predict_paths(clips[:1])))

    def serial_run():
        n = 0
        for item in clips:
            _, imgs = pipe.decode_paths(item)
            _ = pipe.predict_one(imgs)  # decode→forward→fetch, no overlap
            n += 1
        return n

    def pipelined_run():
        return sum(1 for _ in pipe.predict_paths(clips))

    for name, fn in (("serial", serial_run), ("pipelined", pipelined_run)):
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        assert n == args.clips
        out[f"{name}_clips_per_s"] = round(args.clips / dt, 3)
        out[f"{name}_s_per_clip"] = round(dt / args.clips, 4)
    out["speedup"] = round(
        out["pipelined_clips_per_s"] / out["serial_clips_per_s"], 3)

    print("SERVE " + json.dumps(out))
    if not args.keep:
        shutil.rmtree(work)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
