#!/usr/bin/env python
"""Per-clip serving latency: p50/p90 of the 3-view 40-frame eval step.

The serving unit is one patient clip — (V=3, T=40, 112, 112, 1) frames
through the full-size model's eval step (frames-as-batch, in-graph
confusion counts) with a scalar fetched to host each call. Each sample is
one dispatch+fetch round trip, so the number INCLUDES the device
transport — on the tunneled dev box that is the realistic serving path;
on a local TPU VM the transport term shrinks to PCIe/ICI latency.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from glfusion_tpu.config import Config
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.train.step import make_eval_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    model = GlobalAndLocal(cfg.model)
    v, t, hw = cfg.model.num_views, cfg.data.clip_length, cfg.data.crop_hw
    rs = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rs.rand(v, t, hw, hw, 1), jnp.float32),
        "masks": jnp.asarray((rs.rand(v, t, hw, hw, 5) > 0.5), jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((v, 1, hw, hw, 1), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, sample, False))(rng)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, 100))
    eval_step = make_eval_step(cfg, model)

    # warm (compile + first transport)
    for _ in range(3):
        out = eval_step(state, batch)
        float(out["loss"])

    samples = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = eval_step(state, batch)
        float(out["loss"])  # scalar fetch — blocks on the whole step
        samples.append((time.perf_counter() - t0) * 1e3)
    samples.sort()
    import math
    n = len(samples)
    rec = {  # nearest-rank percentiles: index ceil(q*n) - 1
        "p50_ms": round(samples[math.ceil(0.5 * n) - 1], 1),
        "p90_ms": round(samples[math.ceil(0.9 * n) - 1], 1),
        "min_ms": round(samples[0], 1),
        "frames_per_clip": v * t,
    }
    print("LATENCY " + json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
