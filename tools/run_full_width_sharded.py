#!/usr/bin/env python
"""Execute the FULL-width (2048-ch tail) sharded production step and
record the evidence.

Closes SURVEY §2.3's last residual (VERDICT r4 Missing #2): the reference
executed multi-device training at its production size (main.py:155); this
repo's full-width multi-chip evidence was AOT-compile-only
(result/compile_multichip_r3.json) until r5. This runner EXECUTES the
fused-preprocess train step + eval step at widths (64,128,256,512) — the
shipping config's exact `_MIN_SHARD_DIM=256` tensor-parallel surface — on
an 8-virtual-device CPU mesh, pins sharded == unsharded numerics
(assertions inside representative_sharded_execution), and writes
result/full_width_sharded_r5.json with wall time and peak RSS.

Run from the repo root (≈10-30 min, needs a few GiB of host RAM):

    python tools/run_full_width_sharded.py [--meshes 2x4[,4x2]]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import resource
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))  # package imports from the repo root


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshes", default="2x4",
                    help="comma-separated data x model meshes (8 devices)")
    args = ap.parse_args(argv)
    meshes = tuple(tuple(int(x) for x in m.split("x"))
                   for m in args.meshes.split(","))

    import jax
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_platforms", "cpu")

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", REPO / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    t0 = time.perf_counter()
    results = mod.full_width_sharded_execution(meshes=meshes)
    wall = time.perf_counter() - t0
    peak_rss_gib = resource.getrusage(
        resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024

    report = {
        "what": "full-width (2048-ch tail) sharded production train+eval "
                "step EXECUTED on an 8-virtual-device CPU mesh; "
                "sharded == unsharded numerics asserted in "
                "__graft_entry__.representative_sharded_execution",
        "widths": [64, 128, 256, 512],
        "results": results,
        "wall_s": round(wall, 1),
        "peak_rss_gib": round(peak_rss_gib, 2),
    }
    out = REPO / "result" / "full_width_sharded_r5.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
