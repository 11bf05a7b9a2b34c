"""Measure the Pallas fused stem vs the flax stem on TPU.

Two levels:
  1. ISOLATED: the per-view-vmapped stem stage (conv+BN+ReLU+maxpool,
     train mode) at the 120-frame cycle shape — fwd and fwd+bwd, via the
     honest chained-scan harness (utils/profiling.time_fn).
  2. FULL STEP: bench.run_train with stem_pallas on/off (the number that
     matters — isolated wins have lost here before, BASELINE.md im2col).

Usage: python tools/bench_stem_pallas.py [--frames 120] [--full] [--iters 8]
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
    from flax import linen as nn

    from glfusion_tpu.models.glfusion import _per_view
    from glfusion_tpu.models.resnet import IEKDStem
    from glfusion_tpu.utils.profiling import time_fn

    class FusedStem(nn.Module):
        stem_width: int = 64
        dtype: str = "float32"

        @nn.compact
        def __call__(self, x, train: bool):
            from glfusion_tpu.models.resnet import _stem_fused_pallas
            return _stem_fused_pallas(self, x, self.stem_width,
                                      jnp.dtype(self.dtype), train)

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
    ap.add_argument("--full", action="store_true",
                    help="also run the FULL train step A/B (slow compiles)")
    ap.add_argument("--skip-isolated", action="store_true")
    args = ap.parse_args()

    print(f"[bench_stem_pallas] platform={jax.devices()[0].platform}",
          flush=True)
    rec = {}
    if not args.skip_isolated:
        rec.update(isolated(args.frames, args.dtype, args.iters))
        print(json.dumps(rec), flush=True)

    if args.full:
        from bench import run_train
        s_off, _ = run_train(batch=8, iters=8)
        print(json.dumps({"full_step_flax_s": round(s_off, 4)}), flush=True)
        s_on, _ = run_train(batch=8, iters=8, stem_pallas=True)
        rec["full_step_flax_s"] = round(s_off, 4)
        rec["full_step_pallas_s"] = round(s_on, 4)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
