#!/usr/bin/env python
"""Per-clip serving LATENCY tail (P50/P99) for the clip pipeline.

tools/bench_serve.py closed the THROUGHPUT book (serial 2.41 → pipelined
3.30 clips/s, host-decode-bound); this tool measures what a caller feels:
end-to-end latency per clip — decode start → uint8 masks on host — for
the live-jit forward vs a saved AOT export, across pipeline depths. Depth
trades latency for throughput (more clips in flight = each waits longer
behind device compute), so the table is the knob's documentation.

Method: ``ClipPipeline.predict_iter``'s decode callback is wrapped to
stamp each clip's decode-start; the consumer stamps yield time. The same
synthetic corpus, decode, and forward serve every arm. A ``--threads``
sweep arm measures how decode workers scale on this host (the CLI's
--serve-threads default follows os.cpu_count, capped at 4).

Run from the repo root (TPU for the recorded numbers; --tiny for CPU
smoke):

    python tools/bench_serve_latency.py [--clips 40] [--depths 1,2,4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _percentiles(lat):
    a = np.asarray(lat)
    return {"p50_ms": round(float(np.percentile(a, 50)) * 1e3, 1),
            "p99_ms": round(float(np.percentile(a, 99)) * 1e3, 1),
            "mean_ms": round(float(a.mean()) * 1e3, 1)}


def measure(pipe, clips, label):
    """One pass over `clips`; returns latency stats + throughput."""
    starts = {}

    def timed_decode(item):
        cid = item[0]
        starts[cid] = time.perf_counter()
        return pipe.decode_paths(item)

    lat = []
    t0 = time.perf_counter()
    for cid, _pred in pipe.predict_iter(clips, timed_decode):
        lat.append(time.perf_counter() - starts[cid])
    wall = time.perf_counter() - t0
    assert len(lat) == len(clips), (label, len(lat))
    return {**_percentiles(lat),
            "clips_per_s": round(len(clips) / wall, 3)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/gl_serve_lat")
    ap.add_argument("--clips", type=int, default=40)
    ap.add_argument("--depths", default="1,2,4")
    ap.add_argument("--threads", type=int, default=None,
                    help="decode workers (default: the CLI rule — "
                         "min(4, cpu_count))")
    ap.add_argument("--threads-sweep", default="1,2,4",
                    help="decode-worker sweep at depth 2 (live arm)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--tiny", action="store_true",
                    help="miniature topology (CPU smoke)")
    ap.add_argument("--platform", default=None,
                    help="pin the jax backend (the env var alone is "
                         "ignored — sitecustomize pre-imports jax); "
                         "--tiny defaults to cpu")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args(argv)

    import jax
    platform = args.platform or ("cpu" if args.tiny else None)
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from glfusion_tpu.config import Config, tiny_config
    from glfusion_tpu.data.infos import load_infos
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.serve import ClipPipeline, export_pipeline_kwargs
    from glfusion_tpu.utils.model_export import (export_serving_forward,
                                                 save_exported)

    cfg = tiny_config() if args.tiny else Config()
    cfg = replace(cfg, model=replace(cfg.model, dtype=args.dtype))
    views = tuple(cfg.model.views)
    hw, t = cfg.data.crop_hw, cfg.data.clip_length
    threads = args.threads or min(4, os.cpu_count() or 1)

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
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

    # AOT export arm: weights baked in, pinned hw, symbolic frame axis
    platform = jax.devices()[0].platform
    exported = export_serving_forward(
        cfg, model, variables,
        platforms=(platform,) if platform != "tpu" else ("tpu",))
    export_dir = work / "export"
    save_exported(exported, str(export_dir), cfg)
    export_kwargs = export_pipeline_kwargs(str(export_dir), cfg)

    out = {"clips": args.clips, "threads": threads, "dtype": args.dtype,
           "platform": platform, "arms": {}}
    depths = [int(d) for d in args.depths.split(",")]

    def run_arm(name, **pipe_kw):
        # arm-resilient: e.g. the axon tunnel rejects the AOT export's
        # baked-weights module (remote_compile HTTP 413) — record the
        # blocker and keep the other arms' numbers
        try:
            pipe = ClipPipeline(cfg, model, variables, **pipe_kw)
            next(iter(pipe.predict_paths(clips[:1])))  # warm the forward
            out["arms"][name] = measure(pipe, clips, name)
        except Exception as e:  # noqa: BLE001 — record, don't lose the run
            out["arms"][name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"ARM {name} {json.dumps(out['arms'][name])}", flush=True)

    for arm, kwargs in (("live", {}), ("export", export_kwargs)):
        for depth in depths:
            run_arm(f"{arm}_depth{depth}", depth=depth, threads=threads,
                    **kwargs)

    # decode-thread scaling (live arm, depth 2): the --serve-threads story
    for th in (int(x) for x in args.threads_sweep.split(",")):
        run_arm(f"live_depth2_threads{th}", depth=2, threads=th)

    print("SERVE_LATENCY " + json.dumps(out))
    if not args.keep:
        shutil.rmtree(work)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
