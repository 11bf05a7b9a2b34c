#!/usr/bin/env python
"""Ablation timing of the REAL train step: localize where 0.34 s/step goes.

Variants timed (chained-scan harness, bf16, reference recipe shapes):
  full                 - production fused-preprocess step (the benchmark)
  no_optimizer         - loss+grads only (no Adam update / state write)
  fwd_only             - loss value only, no grad
  cycle_light          - heads skipped on the 120-frame cycle forward
  no_cycle             - supervised 24 frames only
  eval_bn_fwd          - fwd 144 frames with BN running averages (train=False)
  train_bn_fwd         - fwd 144 frames with batch-stat BN (train=True)

The last two isolate the train-mode BatchNorm cost (batch-stat reductions
+ stat writes over the big stem/layer1 activations).
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
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer
    from glfusion_tpu.train.losses import bce_with_logits_sum
    from glfusion_tpu.utils.profiling import time_fn

    batch, clip_len, iters = 8, 40, 6
    cfg = Config()
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

    def fresh_state():
        return TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=make_optimizer(cfg, 100))

    out = {}

    def timed_state_fn(label, step_like, batch_i):
        """step_like(state, batch, rng) -> (state, scalar). Chained scan."""
        state = fresh_state()

        def chained(state, b, k):
            from glfusion_tpu.utils.profiling import consume_state

            def body(carry, i):
                st, s = step_like(carry, b, jax.random.fold_in(k, i))
                return st, s
            st, vals = jax.lax.scan(body, state, jnp.arange(iters))
            # consume_state keeps BN-stat-only-live work (cycle heads)
            # from being DCE'd — the bug this tool exists to expose
            return consume_state(jnp.sum(vals), st)

        comp = jax.jit(chained).lower(state, batch_i, rng).compile()
        float(comp(state, batch_i, rng))
        t0 = time.perf_counter()
        float(comp(state, batch_i, rng))
        out[label] = round((time.perf_counter() - t0) / iters, 4)
        print(label, out[label], flush=True)

    # 1. full production step
    full_step = make_train_step(cfg, model, fuse_preprocess=True,
                                compiler_options=None)
    timed_state_fn("full", lambda st, b, k: _unpack(full_step(st, b, k)), raw)

    # 2. cycle_light
    lcfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, cycle_light=True))
    light_step = make_train_step(lcfg, model, fuse_preprocess=True,
                                 compiler_options=None)
    timed_state_fn("cycle_light",
                   lambda st, b, k: _unpack(light_step(st, b, k)), raw)

    # 3. no cycle (supervised only)
    ncfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, use_cycle=False))
    nc_step = make_train_step(ncfg, model, fuse_preprocess=True,
                              compiler_options=None)
    timed_state_fn("no_cycle", lambda st, b, k: _unpack(nc_step(st, b, k)),
                   {k: raw[k] for k in ("images_raw", "masks_raw")})

    # 4. grads but no optimizer update; 5. fwd-only loss value
    from glfusion_tpu.data.pipeline import _preprocess_core, view_ids_tuple
    view_ids = view_ids_tuple(cfg.model.views)

    def make_loss_variant(do_grad):
        def step_like(state, b, k):
            kp, kd, kc = jax.random.split(k, 3)
            pre = _preprocess_core(kp, b["images_raw"], b["masks_raw"],
                                   crop_hw=cfg.data.crop_hw, is_train=True,
                                   view_ids=view_ids)

            def loss_fn(params):
                o, upd = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    pre["images"], True, mutable=["batch_stats"],
                    rngs={"dropout": kd})
                loss = 0.0
                for vi in range(v):
                    loss += bce_with_logits_sum(o["mask"][vi],
                                                pre["masks"][vi])
                o2, _ = model.apply(
                    {"params": params, "batch_stats": upd["batch_stats"]},
                    b["clips"], True, mutable=["batch_stats"],
                    rngs={"dropout": kc})
                feat = jnp.sum(o2["f4_global"].astype(jnp.float32),
                               axis=(2, 3))
                return loss + 1e-2 * jnp.sum(feat ** 2) * 1e-12

            if do_grad:
                val, grads = jax.value_and_grad(loss_fn)(state.params)
                g0 = sum(jnp.max(jnp.abs(l)).astype(jnp.float32)
                         for l in jax.tree_util.tree_leaves(grads))
                return state, val + g0
            return state, loss_fn(state.params)
        return step_like

    timed_state_fn("no_optimizer", make_loss_variant(True), raw)
    timed_state_fn("fwd_only", make_loss_variant(False), raw)

    # 6/7. BN-mode cost on a 144-frame forward (no grad, no loss plumbing)
    x144 = jnp.asarray(rs.rand(v, batch + clip_len, c, c, 1), jnp.float32)

    def fwd_eval(vs, x):
        return model.apply(vs, x, False)["mask"]

    def fwd_train(vs, x):
        o, _ = model.apply(vs, x, True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(7)})
        return o["mask"]

    out["eval_bn_fwd_144"] = round(
        time_fn(fwd_eval, variables, x144, iters=8), 4)
    out["train_bn_fwd_144"] = round(
        time_fn(fwd_train, variables, x144, iters=8), 4)

    print("ABLATE " + json.dumps(out))
    return 0


def _unpack(res):
    st, m = res
    return st, m["loss"]


if __name__ == "__main__":
    raise SystemExit(main())
