"""Gradient-accumulation probe: effective batch 32 on one chip.

BASELINE.md records that a monolithic supervised batch 32 + 40-frame cycle
clips OOMs one v5e chip. ``--grad-accum 4`` (TrainConfig.grad_accum) scans
four batch-8 supervised microbatches per Adam update — the exact big-batch
gradient under the sum-reduction loss — holding only one microbatch's
activations at a time.

Arms (exact bench.run_train chained-scan harness, shipped compile options):
  batch8        — the recorded default (one batch-8 update)
  accum4_eff32  — batch 8 × grad_accum 4 (one effective-batch-32 update)
plus single-step ``memory_analysis()`` for the monolithic batch-32 step
(compile-only — execution is what OOMs) vs the accumulated step, showing
the temp-buffer budget the scan removes.

Usage: python tools/bench_grad_accum.py [--iters 10] [--out F]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _memory_gib(cfg, model, n_frames, rng_seed=0):
    """Single-step compile HBM budget for a batch of n_frames/view."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from glfusion_tpu.config import default_compiler_options
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer
    from glfusion_tpu.utils.profiling import consume_state

    v = cfg.model.num_views
    r, c, t = cfg.data.resize_hw, cfg.data.crop_hw, cfg.data.clip_length
    rs = np.random.RandomState(rng_seed)
    batch = {
        "images_raw": jnp.asarray(rs.rand(v, n_frames, r, r) * 255,
                                  jnp.float32),
        "masks_raw": jnp.asarray(rs.randint(0, 3, (v, n_frames, r, r)),
                                 jnp.int32),
        "clips": jnp.asarray(rs.rand(v, t, c, c, 1) * 255, jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((v, 1, c, c, 1), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, sample, False))(rng)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, 100))
    step = make_train_step(cfg, model, fuse_preprocess=True,
                           compiler_options=None)

    def one(state, batch, rng):
        st, m = step(state, batch, rng)
        return consume_state(m["loss"], st)

    compiled = jax.jit(one).lower(state, batch, rng).compile(
        compiler_options=default_compiler_options())
    ma = compiled.memory_analysis()
    gib = 1024 ** 3
    return {"arguments_gib": round(ma.argument_size_in_bytes / gib, 3),
            "temps_gib": round(ma.temp_size_in_bytes / gib, 3),
            "output_gib": round(ma.output_size_in_bytes / gib, 3)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-memory", action="store_true")
    ap.add_argument("--out", default="result/grad_accum_probe.json")
    args = ap.parse_args(argv)

    import jax

    from bench import run_train

    assert jax.devices()[0].platform != "cpu", "probe is a TPU measurement"

    report = {"harness": f"bench.run_train(batch=8, iters={args.iters})",
              "rows": []}
    base = None
    for name, accum in (("batch8", 1), ("accum4_eff32", 4)):
        t0 = time.time()
        step_s, flops = run_train(batch=8, iters=args.iters,
                                  grad_accum=accum)
        rec = {"name": name, "step_s": round(step_s, 4),
               "tflops_per_s": (round(flops / step_s / 1e12, 1)
                                if flops else None),
               "per_microbatch_s": round(step_s / accum, 4),
               "vs_batch8_per_microbatch_pct": (
                   round(100 * (step_s / accum - base) / base, 2)
                   if base is not None else None),
               "compile_plus_run_s": round(time.time() - t0, 1)}
        if base is None:
            base = step_s
        report["rows"].append(rec)
        print(f"[grad-accum] {name}: {rec['step_s']} s/update "
              f"({rec['per_microbatch_s']} s/microbatch)", flush=True)
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(report, indent=1))

    if not args.skip_memory:
        from glfusion_tpu.config import Config
        from glfusion_tpu.models import GlobalAndLocal

        cfg = Config()
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, dtype="bfloat16",
                                           remat=True))
        model = GlobalAndLocal(cfg.model)
        # both arms consume 32 frames/view per update; only the microbatch
        # split differs
        for name, bs, accum in (("monolithic_b32", 32, 1),
                                ("accum4_eff32", 8, 4)):
            c = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, batch_size=bs,
                                               grad_accum=accum))
            mem = _memory_gib(c, model, n_frames=32)
            report.setdefault("memory", {})[name] = mem
            print(f"[grad-accum] memory {name}: {mem}", flush=True)
        Path(args.out).write_text(json.dumps(report, indent=1))

    print(json.dumps(report["rows"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
