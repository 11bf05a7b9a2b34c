"""Measure the Pallas fused stem vs the flax stem on TPU (closed book).

ISOLATED comparison: the per-view-vmapped stem stage (conv+BN+ReLU+maxpool,
train mode) at the 120-frame cycle shape — fwd and fwd+bwd, via the honest
chained-scan harness (utils/profiling.time_fn). The historical FULL-STEP
A/B rows (in-model swap) are recorded in BASELINE.md "stem kernel book".

Usage: python experiments/bench_stem_pallas.py [--frames 120] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def isolated(frames: int, dtype: str, iters: int) -> dict:
    from glfusion_tpu.models.glfusion import _per_view
    from glfusion_tpu.models.resnet import IEKDStem
    from glfusion_tpu.utils.profiling import time_fn

    from experiments.stem_module import FusedIEKDStem as FusedStem

    v = 3
    x = jnp.asarray(np.random.RandomState(0).rand(v, frames, 112, 112, 1),
                    jnp.float32)
    out = {}
    for name, cls in (("flax", IEKDStem), ("pallas", FusedStem)):
        mod = _per_view(cls)(stem_width=64, dtype=dtype, name="stem")
        variables = jax.jit(lambda r: mod.init(r, x, False))(
            jax.random.PRNGKey(0))

        def fwd(variables, x):
            y, upd = mod.apply(variables, x, True, mutable=["batch_stats"])
            return y, upd["batch_stats"]

        def fwdbwd(variables, x):
            def loss(p):
                y, upd = mod.apply(
                    {"params": p,
                     "batch_stats": variables["batch_stats"]},
                    x, True, mutable=["batch_stats"])
                return (jnp.sum(y.astype(jnp.float32) ** 2),
                        upd["batch_stats"])

            (val, bs), g = jax.value_and_grad(loss, has_aux=True)(
                variables["params"])
            return val, bs, g

        out[f"{name}_fwd_ms"] = round(
            time_fn(fwd, variables, x, iters=iters) * 1e3, 2)
        out[f"{name}_fwdbwd_ms"] = round(
            time_fn(fwdbwd, variables, x, iters=iters) * 1e3, 2)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    # NOTE: the historical FULL-STEP A/B (bench.run_train with the stem
    # swapped in-model) needed the since-removed ModelConfig.stem_pallas
    # flag; its measured numbers are recorded in BASELINE.md "stem kernel
    # book". What remains runnable is the isolated-stage comparison.
    print(f"[bench_stem_pallas] platform={jax.devices()[0].platform}",
          flush=True)
    rec = isolated(args.frames, args.dtype, args.iters)
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
