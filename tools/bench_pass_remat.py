"""Per-pass rematerialization probe for the full train step.

Hypothesis: per-block remat exists to fit the 120-frame cycle pass in HBM
(bf16 no-remat OOMs at 16.6 GiB, BASELINE.md); the SUPERVISED pass is only
batch·V = 24 frames, so keeping its activations costs ~1/6 of the
activation memory while skipping its share of the backward recompute.
``make_train_step(..., sup_model=...)`` runs the supervised forward through
a no-remat twin of the model (``nn.remat`` preserves the variable tree, so
both modules consume the same params — asserted here before timing).

Arms (exact bench.run_train chained-scan harness, shipped compile options):
  both_remat   — the r3 recorded default (remat supervised + cycle)
  sup_noremat  — remat cycle only
plus single-step ``memory_analysis()`` per arm for the HBM budget.

Usage: python tools/bench_pass_remat.py [--iters 10] [--out F]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _param_paths(model, cfg):
    import jax
    import jax.numpy as jnp

    v, c = cfg.model.num_views, cfg.data.crop_hw
    sample = jnp.zeros((v, 1, c, c, 1), jnp.float32)
    variables = jax.eval_shape(
        lambda r: model.init(r, sample, False), jax.random.PRNGKey(0))
    return {jax.tree_util.keystr(k): tuple(x.shape)
            for k, x in jax.tree_util.tree_leaves_with_path(variables)}


def _memory_gib(step, state, batch, rng):
    """Single-step compile HBM budget (args are what they are; temps are
    the lever the remat choice moves)."""
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
    ap.add_argument("--out", default="result/pass_remat_probe.json")
    args = ap.parse_args(argv)

    import jax

    from bench import run_train

    assert jax.devices()[0].platform != "cpu", "probe is a TPU measurement"

    # safety: the no-remat twin must expose the identical parameter tree
    from glfusion_tpu.config import Config
    from glfusion_tpu.models import GlobalAndLocal

    cfg = Config()
    mc = dataclasses.replace(cfg.model, dtype="bfloat16")
    paths_remat = _param_paths(
        GlobalAndLocal(dataclasses.replace(mc, remat=True)), cfg)
    paths_plain = _param_paths(
        GlobalAndLocal(dataclasses.replace(mc, remat=False)), cfg)
    assert paths_remat == paths_plain, "remat changed the variable tree"
    print(f"[pass-remat] variable trees identical "
          f"({len(paths_remat)} leaves)", flush=True)

    report = {"harness": f"bench.run_train(batch=8, iters={args.iters})",
              "rows": []}
    base = None
    for name, sup_remat in (("both_remat", None), ("sup_noremat", False)):
        t0 = time.time()
        step_s, flops = run_train(batch=8, iters=args.iters,
                                  sup_remat=sup_remat)
        rec = {"name": name, "step_s": round(step_s, 4),
               "tflops_per_s": (round(flops / step_s / 1e12, 1)
                                if flops else None),
               "delta_vs_both_pct": (round(100 * (step_s - base) / base, 2)
                                     if base is not None else None),
               "compile_plus_run_s": round(time.time() - t0, 1)}
        if base is None:
            base = step_s
        report["rows"].append(rec)
        print(f"[pass-remat] {name}: {rec['step_s']} s/step "
              f"({rec['delta_vs_both_pct']}%)", flush=True)
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(report, indent=1))

    if not args.skip_memory:
        # memory budgets from single-step compiles (the chained-scan graph
        # shares buffers across iterations and hides the per-step budget)
        import jax.numpy as jnp
        import numpy as np

        from glfusion_tpu.train.step import make_train_step
        from glfusion_tpu.train.train_state import TrainState, make_optimizer

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, dtype="bfloat16",
                                           remat=True))
        model = GlobalAndLocal(cfg.model)
        sup_model = GlobalAndLocal(
            dataclasses.replace(cfg.model, remat=False))
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
        variables = jax.jit(lambda k: model.init(k, sample, False))(rng)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=make_optimizer(cfg, 100))
        for name, sm in (("both_remat", None), ("sup_noremat", sup_model)):
            step = make_train_step(cfg, model, fuse_preprocess=True,
                                   compiler_options=None, sup_model=sm)
            mem = _memory_gib(step, state, batch, rng)
            for row in report["rows"]:
                if row["name"] == name:
                    row["memory"] = mem
            print(f"[pass-remat] {name}: {mem}", flush=True)
        Path(args.out).write_text(json.dumps(report, indent=1))

    print(json.dumps(report["rows"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
