#!/usr/bin/env python
"""Train-step decomposition + TPAVI impl table on the real chip.

Times (chained-scan harness, sound against the remote transport):
  full train step / supervised-only step / cycle-forward only /
  eval forward, and the fwd & fwd+bwd of the three TPAVI contraction
  implementations at the reference shape. Feeds the BASELINE.md tables.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from glfusion_tpu.config import Config
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.train.step import make_eval_step, make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer
    from glfusion_tpu.utils.profiling import flops_of, time_fn

    batch, clip_len = 8, 40
    cfg = Config()
    # remat matches the recorded benchmark config: the honest (non-DCE'd)
    # bf16 full step OOMs one v5e chip without it (BASELINE.md)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, dtype="bfloat16", remat=True),
        data=dataclasses.replace(cfg.data, clip_length=clip_len),
        train=dataclasses.replace(cfg.train, batch_size=batch))
    model = GlobalAndLocal(cfg.model)
    v = cfg.model.num_views
    r, c = cfg.data.resize_hw, cfg.data.crop_hw
    rs = np.random.RandomState(0)
    raw = {
        "images_raw": jnp.asarray(rs.rand(v, batch, r, r) * 255, jnp.float32),
        "masks_raw": jnp.asarray(rs.randint(0, 3, (v, batch, r, r)),
                                 jnp.int32),
        "clips": jnp.asarray(rs.rand(v, clip_len, c, c, 1) * 255,
                             jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((v, 1, c, c, 1), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, sample, False))(rng)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, 100))

    out = {}

    def timed_step(cfg_i, batch_i, label, iters=6):
        step = make_train_step(cfg_i, model, fuse_preprocess=True,
                               compiler_options=None)

        def chained(state, b, k):
            from glfusion_tpu.utils.profiling import consume_state

            def body(carry, i):
                st, m = step(carry, b, jax.random.fold_in(k, i))
                return st, m["loss"]
            st, losses = jax.lax.scan(body, state, jnp.arange(iters))
            return consume_state(jnp.sum(losses), st)

        import time as _t
        comp = jax.jit(chained).lower(state, batch_i, rng).compile()
        float(comp(state, batch_i, rng))
        t0 = _t.perf_counter()
        float(comp(state, batch_i, rng))
        out[label] = round((_t.perf_counter() - t0) / iters, 4)

    timed_step(cfg, raw, "train_step_full_s")
    no_cyc = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, use_cycle=False))
    timed_step(no_cyc, {k: raw[k] for k in ("images_raw", "masks_raw")},
               "train_step_supervised_only_s")

    # eval forward (24 frames) and cycle-shaped forward (120 frames)
    x24 = jnp.asarray(rs.rand(v, batch, c, c, 1), jnp.float32)
    x120 = jnp.asarray(rs.rand(v, clip_len, c, c, 1), jnp.float32)
    fwd = lambda vs, x: model.apply(vs, x, False)["mask"]
    out["fwd_24f_s"] = round(time_fn(fwd, variables, x24, iters=10), 4)
    out["fwd_120f_s"] = round(time_fn(fwd, variables, x120, iters=6), 4)

    # TPAVI impl table at the reference attention shape
    from glfusion_tpu.ops.nonlocal_attn import dot_nonlocal_attention
    from glfusion_tpu.ops.tpavi_pallas import fused_dot_nonlocal
    b_, n_, c_ = batch, 3 * 28 * 28, 1024
    ops = [jnp.asarray(rs.randn(b_, n_, c_), jnp.bfloat16) for _ in range(3)]
    impls = {
        "tpavi_naive": lambda t, p, g: dot_nonlocal_attention(
            t, p, g, impl="naive"),
        "tpavi_reassoc": lambda t, p, g: dot_nonlocal_attention(
            t, p, g, impl="reassoc"),
        "tpavi_pallas": lambda t, p, g: fused_dot_nonlocal(t, p, g),
    }
    for name, fn in impls.items():
        out[f"{name}_fwd_ms"] = round(
            time_fn(fn, *ops, iters=20) * 1e3, 3)

        def loss(t, p, g, _fn=fn):
            return jnp.sum(_fn(t, p, g).astype(jnp.float32) ** 2)

        grad_fn = jax.grad(loss, argnums=(0, 1, 2))
        out[f"{name}_fwdbwd_ms"] = round(
            time_fn(grad_fn, *ops, iters=20) * 1e3, 3)

    print("PROFILE " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
