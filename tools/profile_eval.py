#!/usr/bin/env python
"""Eval-forward decomposition: where the inference milliseconds go.

The train step has a closed utilization book (BASELINE.md: per-stage
xprof attribution, stem/conv-backward floors measured and attributed).
This tool closes the EVAL book the same way for the bench.py headline
graph — full-size Global_and_Local forward, bf16, batch 32 frames/view
(reference eval protocol is frames-as-batch clip inference,
``/root/reference/GLfusion/main.py:459-543``):

  1. chained-scan device time + XLA cost-analysis FLOPs → achieved
     TFLOP/s and % of v5e bf16 peak for the whole forward;
  2. an xprof trace (``jax.profiler`` + ``xprof.convert.raw_to_tool_data``
     ``framework_op_stats``) grouped into stages by HLO op-name metadata
     (stem / layer1..4 / ASPP / TPAVI fusion / classifier+center heads /
     resize + elementwise glue) so each stage carries its own ms, FLOPs
     and % of peak.

Writes ``result/eval_profile_r3.json`` and prints the stage table.
"""

from __future__ import annotations

import json
import re
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0
BATCH = 32
ITERS = 10

# HLO metadata op_name fragments → stage buckets. flax scopes surface in
# the op_name path (e.g. ".../backbone/layer3/blocks_4/conv2/...").
STAGE_PATTERNS = [
    ("stem", re.compile(
        r"stem_conv|stem_bn|/stem|vmap\(backbone\)/reduce_window_max")),
    ("layer1", re.compile(r"layer1_block|/layer1\b")),
    ("layer2", re.compile(r"layer2_block|/layer2\b")),
    ("layer3", re.compile(r"layer3_block|/layer3\b")),
    ("layer4", re.compile(r"layer4_block|/layer4\b")),
    # both DeepLab heads (classifier + centerness), all applications
    ("aspp_heads", re.compile(
        r"vmap\(classifier\)|vmap\(centerness\)|aspp|deeplab", re.I)),
    ("tpavi", re.compile(
        r"global_attn|local_attn|tpavi|mgfm|mlfm|nonlocal", re.I)),
    ("resize_glue", re.compile(
        r"resize|interpolate|iota|convert_element_type")),
    # bare top-level elementwise (residual adds, sigmoid gates, masking)
    ("elementwise_glue", re.compile(
        r"GlobalAndLocal/(add|mul|sub|div|max|min|sigmoid|tanh|exp|"
        r"rsqrt|select|compare|broadcast)")),
]


def classify(op_name: str) -> str:
    for stage, pat in STAGE_PATTERNS:
        if pat.search(op_name):
            return stage
    return "other"


def _gviz_rows(data: str) -> list:
    """gviz table JSON → list of {col_id: value} dicts."""
    tables = json.loads(data)
    if isinstance(tables, dict):
        tables = [tables]
    out = []
    for table in tables:
        if not isinstance(table, dict) or "cols" not in table:
            continue
        ids = [c.get("id") for c in table["cols"]]
        for r in table.get("rows", []):
            cells = r.get("c", [])
            out.append({
                ids[i]: (cells[i] or {}).get("v")
                for i in range(min(len(ids), len(cells)))
            })
    return out


def main() -> int:
    from glfusion_tpu.config import Config, default_compiler_options
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.utils.profiling import time_fn

    import dataclasses

    cfg = Config()
    mcfg = dataclasses.replace(cfg.model, dtype="bfloat16")
    model = GlobalAndLocal(mcfg)
    v = mcfg.num_views
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(v, BATCH, 112, 112, 1), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, False))(
        jax.random.PRNGKey(0))

    def fwd(variables, x):
        return model.apply(variables, x, False)["mask"]

    out = {"batch_frames_per_view": BATCH, "views": v, "dtype": "bfloat16"}

    # ---- whole-forward device time (sound harness) + FLOPs
    t_s = time_fn(fwd, variables, x, iters=ITERS)
    comp = jax.jit(fwd).lower(variables, x).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0)) if ca else 0.0
    frames = v * BATCH
    out["fwd_s"] = round(t_s, 5)
    out["frames_per_s"] = round(frames / t_s, 1)
    out["gflop_per_fwd"] = round(flops / 1e9, 1)
    tfs = flops / t_s / 1e12 if flops else 0.0
    out["tflops_per_s"] = round(tfs, 1)
    out["pct_of_peak"] = round(100.0 * tfs / V5E_BF16_PEAK_TFLOPS, 1)

    # with the shipped compile options (what bench.py records)
    comp_opt = jax.jit(fwd).lower(variables, x).compile(
        compiler_options=default_compiler_options())
    jax.block_until_ready(comp_opt(variables, x))

    # ---- xprof per-op attribution, bucketed into stages
    logdir = tempfile.mkdtemp(prefix="glfusion_evalprof_")
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        r = comp_opt(variables, x)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()

    from xprof.convert import raw_to_tool_data

    run_dirs = list(Path(logdir).glob("plugins/profile/*"))
    xspaces = [str(p) for p in run_dirs[0].glob("*.xplane.pb")]
    # despite tqx=out:csv this xprof version returns gviz JSON:
    # [{"cols": [{"id": ...}], "rows": [{"c": [{"v": ...}, ...]}]}]
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xspaces, "framework_op_stats", {"tqx": "out:csv"})
    if isinstance(data, bytes):
        data = data.decode()
    rows = _gviz_rows(data)
    stage_ms = defaultdict(float)
    stage_ops = defaultdict(int)
    op_ms = defaultdict(float)
    total_ms = 0.0
    dev_rows = 0
    for row in rows:
        # device-side ops only (host rows carry the python dispatch)
        if str(row.get("host_or_device", "")).lower().startswith("host"):
            continue
        name = str(row.get("operation", ""))
        t_us = float(row.get("total_self_time") or 0.0)
        # the trace holds 3 invocations
        ms = t_us / 1e3 / 3.0
        stage = classify(name)
        stage_ms[stage] += ms
        stage_ops[stage] += 1
        op_ms[name] += ms
        total_ms += ms
        dev_rows += 1
    out["xprof_total_device_ms_per_fwd"] = round(total_ms, 3)
    out["xprof_device_op_rows"] = dev_rows
    # Through the remote transport extra lazily-dispatched executions can
    # land inside the trace window, inflating absolute ms; percentages
    # are robust, and ms_scaled renormalizes each stage to the honestly
    # measured chained-scan forward time.
    scale = (t_s * 1e3) / total_ms if total_ms else 0.0
    out["stages"] = {
        s: {"ms_raw": round(stage_ms[s], 3),
            "ms_scaled": round(stage_ms[s] * scale, 3),
            "pct_of_device": round(100.0 * stage_ms[s] / total_ms, 1)
            if total_ms else 0.0,
            "ops": stage_ops[s]}
        for s in sorted(stage_ms, key=stage_ms.get, reverse=True)
    }
    # top individual ops (for the "what would a kernel buy" question)
    top = sorted(op_ms.items(), key=lambda kv: kv[1], reverse=True)[:15]
    out["top_ops"] = [{"op": k[:120], "ms": round(v_, 3)} for k, v_ in top]

    res = Path(__file__).resolve().parent.parent / "result"
    res.mkdir(exist_ok=True)
    (res / "eval_profile_r3.json").write_text(json.dumps(out, indent=1))
    print("EVAL_PROFILE " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
