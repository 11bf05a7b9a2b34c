"""Sweep documented XLA:TPU compiler options against the full train step.

Target: the two measured single-chip MFU floors (BASELINE.md r2) —
~72 ms/step of conv-backward layout transposes and the bandwidth-bound
stem/layer1 — are *compiler* behavior, not graph structure, so the only
graph-preserving lever left is the TPU compiler's own documented knobs.

Method: the EXACT bench.run_train harness (chained 10-step scan over the
production bf16 batch-8 + 40-frame-clip recipe, all-leaf-consuming output,
one scalar fetch) recompiled per flag set via
``jit(...).lower(...).compile(compiler_options=...)`` — options pass
through the PJRT tunnel to the remote TPU compiler (verified: unknown
flags 500 there, known flags compile). Baseline (no options) is re-measured
in the same process/run so deltas are apples-to-apples.

Each full-size compile is minutes (uncached per option set), so run this
in the background: ``python tools/sweep_xla_flags.py --out result/...``.

Usage: python tools/sweep_xla_flags.py [--iters 10] [--quick] [--out F]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (name, options) — one hypothesis per row, combos only for winners.
SWEEP = [
    ("baseline", None),
    # bigger scoped VMEM -> larger fusions, fewer HBM round-trips
    ("scoped_vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    # scheduler: overlap copies/transposes with compute
    ("latency_hiding_sched",
     {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    # fusion policy variants
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("aggressive_loop_fusion_layout",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    ("experimental_fusion_cost_model",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true"}),
    ("dot_dot_fusion_dup", {"xla_tpu_dot_dot_fusion_duplicated": "true"}),
    ("multi_level_loop_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}),
    # copy/transpose handling
    ("copy_fusion_pad_ratio_100",
     {"xla_tpu_copy_fusion_pad_unpad_ratio": "100"}),
    ("vmem_to_vmem_dmas", {"xla_tpu_enable_vmem_to_vmem_dmas": "true"}),
    ("vector_ls_fusion_windows",
     {"xla_tpu_vector_load_fusion_window": "2048",
      "xla_tpu_vector_store_fusion_window": "1024"}),
    # round 2 of the sweep: bracket the scoped-vmem optimum (32M won -1.6%)
    ("scoped_vmem_24m", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("scoped_vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("scoped_vmem_32m_no_rwb",
     {"xla_tpu_scoped_vmem_limit_kib": "32768",
      "xla_tpu_rwb_fusion": "false"}),
    # round 3 of the sweep: finer bracket of the 32M optimum + pairings of
    # the winner with each near-neutral flag (combos may add where singles
    # were noise)
    ("scoped_vmem_28m_no_rwb",
     {"xla_tpu_scoped_vmem_limit_kib": "28672",
      "xla_tpu_rwb_fusion": "false"}),
    ("scoped_vmem_36m_no_rwb",
     {"xla_tpu_scoped_vmem_limit_kib": "36864",
      "xla_tpu_rwb_fusion": "false"}),
    ("scoped_vmem_40m_no_rwb",
     {"xla_tpu_scoped_vmem_limit_kib": "40960",
      "xla_tpu_rwb_fusion": "false"}),
    ("winner_plus_lhs",
     {"xla_tpu_scoped_vmem_limit_kib": "32768",
      "xla_tpu_rwb_fusion": "false",
      "xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("winner_plus_aggressive_loop_fusion",
     {"xla_tpu_scoped_vmem_limit_kib": "32768",
      "xla_tpu_rwb_fusion": "false",
      "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    ("winner_plus_fusion_cost_model",
     {"xla_tpu_scoped_vmem_limit_kib": "32768",
      "xla_tpu_rwb_fusion": "false",
      "xla_tpu_enable_experimental_fusion_cost_model": "true"}),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--quick", action="store_true",
                    help="baseline + the first three hypotheses only")
    ap.add_argument("--only", default=None,
                    help="comma-separated row names to run")
    ap.add_argument("--out", default="result/xla_flag_sweep_r3.json")
    ap.add_argument("--infer", action="store_true",
                    help="sweep the INFERENCE graph (bench.run, frames/s — "
                         "higher is better) instead of the train step")
    args = ap.parse_args(argv)

    import jax

    from bench import BATCH_FRAMES, run, run_train

    assert jax.devices()[0].platform != "cpu", "sweep is a TPU measurement"

    rows = SWEEP[:4] if args.quick else SWEEP
    if args.only:
        names = set(args.only.split(","))
        rows = [r for r in SWEEP if r[0] in names]
    report = []
    base_s = None
    for name, opts in rows:
        t0 = time.time()
        try:
            if args.infer:
                metric = run(batch=BATCH_FRAMES, iters=max(args.iters, 10),
                             compiler_options=opts)
            else:
                metric, _ = run_train(batch=8, iters=args.iters,
                                      compiler_options=opts)
        except Exception as e:  # a flag may 500 the remote compiler
            print(f"[sweep] {name}: FAILED {str(e).splitlines()[0][:100]}",
                  flush=True)
            report.append({"name": name, "options": opts, "error": True})
            continue
        compile_s = time.time() - t0
        if name == "baseline":
            base_s = metric
        key = "frames_per_s" if args.infer else "step_s"
        rec = {"name": name, "options": opts,
               key: round(metric, 4),
               "delta_vs_baseline_pct": (
                   round(100.0 * (metric - base_s) / base_s, 2)
                   if base_s else None),
               "compile_plus_run_s": round(compile_s, 1)}
        report.append(rec)
        unit = "frames/s" if args.infer else "s/step"
        print(f"[sweep] {name}: {metric:.4f} {unit} "
              f"({rec['delta_vs_baseline_pct']}% vs baseline)", flush=True)
        harness = ("bench.run(batch=%d)" % BATCH_FRAMES if args.infer
                   else "bench.run_train(batch=8, iters=%d)" % args.iters)
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(
            {"harness": harness, "rows": report}, indent=1))
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
