"""Fused supervised+cycle pass probe for the full train step.

Hypothesis: the train step runs TWO forwards per step — the 24-frame
supervised pass and the 120-frame cycle pass (reference main.py:193-243
structure). Concatenating them into ONE merged backbone(+global-attention)
pass (``TrainConfig.fuse_passes``; ``GlobalAndLocal.__call__ sup_count``)
keeps the FLOPs identical (cycle-light head semantics) but amortizes the
per-pass fixed costs: one conv launch per stage at batch 144 instead of
two at 24/120, one set of backward layout transposes, one BN-stat
reduction per stage.

Arms (exact bench.run_train chained-scan harness, shipped compile options):
  both_pass    — the recorded default (supervised + full cycle forward)
  cycle_light  — supervised + features-only cycle forward (the semantics
                 fuse_passes implies; isolates the fusion win from the
                 head skip)
  fused        — one merged pass
plus single-step ``memory_analysis()`` per arm for the HBM budget (the
merged batch co-residents 144 frames per stage instead of 120).

Usage: python tools/bench_pass_fusion.py [--iters 10] [--out F]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _memory_gib(step, state, batch, rng):
    import jax

    from glfusion_tpu.config import default_compiler_options
    from glfusion_tpu.utils.profiling import consume_state

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
    ap.add_argument("--out", default="result/pass_fusion_probe.json")
    args = ap.parse_args(argv)

    import jax

    from bench import run_train

    assert jax.devices()[0].platform != "cpu", "probe is a TPU measurement"

    report = {"harness": f"bench.run_train(batch=8, iters={args.iters})",
              "rows": []}
    base = None
    arms = (("both_pass", {}),
            ("cycle_light", {"cycle_light": True}),
            ("fused", {"fuse_passes": True}))
    for name, kw in arms:
        t0 = time.time()
        step_s, flops = run_train(batch=8, iters=args.iters, **kw)
        rec = {"name": name, "step_s": round(step_s, 4),
               "tflops_per_s": (round(flops / step_s / 1e12, 1)
                                if flops else None),
               "delta_vs_both_pct": (round(100 * (step_s - base) / base, 2)
                                     if base is not None else None),
               "compile_plus_run_s": round(time.time() - t0, 1)}
        if base is None:
            base = step_s
        report["rows"].append(rec)
        print(f"[pass-fusion] {name}: {rec['step_s']} s/step "
              f"({rec['delta_vs_both_pct']}%)", flush=True)
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(report, indent=1))

    if not args.skip_memory:
        import dataclasses

        import jax.numpy as jnp
        import numpy as np

        from glfusion_tpu.config import Config
        from glfusion_tpu.models import GlobalAndLocal
        from glfusion_tpu.train.step import make_train_step
        from glfusion_tpu.train.train_state import TrainState, make_optimizer

        cfg = Config()
        v, b = cfg.model.num_views, cfg.train.batch_size
        r, c, t = cfg.data.resize_hw, cfg.data.crop_hw, cfg.data.clip_length
        rs = np.random.RandomState(0)
        batch = {
            "images_raw": jnp.asarray(rs.rand(v, b, r, r) * 255, jnp.float32),
            "masks_raw": jnp.asarray(rs.randint(0, 3, (v, b, r, r)),
                                     jnp.int32),
            "clips": jnp.asarray(rs.rand(v, t, c, c, 1) * 255, jnp.float32),
        }
        rng = jax.random.PRNGKey(0)
        sample = jnp.zeros((v, 1, c, c, 1), jnp.float32)
        for name, kw in arms:
            ci = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, dtype="bfloat16",
                                               remat=True),
                train=dataclasses.replace(cfg.train, **kw))
            model = GlobalAndLocal(ci.model)
            variables = jax.jit(lambda k: model.init(k, sample, False))(rng)
            state = TrainState.create(
                apply_fn=model.apply, params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
                tx=make_optimizer(ci, 100))
            step = make_train_step(ci, model, fuse_preprocess=True,
                                   compiler_options=None)
            mem = _memory_gib(step, state, batch, rng)
            for row in report["rows"]:
                if row["name"] == name:
                    row["memory"] = mem
            print(f"[pass-fusion] {name}: {mem}", flush=True)
        Path(args.out).write_text(json.dumps(report, indent=1))

    print(json.dumps(report["rows"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
