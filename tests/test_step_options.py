"""Compiler-options plumbing on the jitted steps.

The shipped XLA:TPU options (config.TPU_COMPILER_OPTIONS) are attached to
the train/eval step jits. JAX rejects compiler options on a NESTED jit, so
every harness that wraps a step in an outer jit (bench.py's chained scan,
the profiling tools via utils/profiling.time_fn) must build the step with
``compiler_options=None`` and apply the options to its outer compile.
This file pins both halves of that contract (regression for a bug where
bench.py crashed on TPU after the options were wired as defaults).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_setup():
    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    cfg = tiny_config()
    model = GlobalAndLocal(cfg.model)
    v, b = cfg.model.num_views, 2
    hw, t = cfg.data.crop_hw, cfg.data.clip_length
    x = jnp.zeros((v, b, hw, hw, 1), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, False))(
        jax.random.PRNGKey(0))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, 1))
    batch = {
        "images": jnp.asarray(
            np.random.RandomState(0).rand(v, b, hw, hw, 1), jnp.float32),
        "masks": jnp.asarray(
            np.random.RandomState(1).rand(v, b, hw, hw, 5) > 0.5,
            jnp.float32),
        "clips": jnp.asarray(
            np.random.RandomState(2).rand(v, t, hw, hw, 1), jnp.float32),
    }
    return cfg, model, state, batch


def test_step_with_options_rejects_outer_jit(monkeypatch):
    """A step carrying compile options must fail loudly when nested (the
    JAX contract), proving the default-options path would break any
    outer-jit harness — which is why those harnesses pass None."""
    from glfusion_tpu.train import step as step_mod

    monkeypatch.setattr(step_mod, "default_compiler_options",
                        lambda *a, **k: {"xla_tpu_rwb_fusion": "false"})
    cfg, model, state, batch = _tiny_setup()
    step = step_mod.make_train_step(cfg, model)  # default → options attached

    @jax.jit
    def outer(state, batch, rng):
        _, m = step(state, batch, rng)
        return m["loss"]

    with pytest.raises(ValueError, match="nested"):
        outer(state, batch, jax.random.PRNGKey(1))


def test_step_without_options_nests_in_outer_scan(monkeypatch):
    """compiler_options=None (what bench.py / the profiling tools pass)
    must nest cleanly inside an outer jitted scan — the bench harness
    arrangement — even when the default options are non-empty."""
    from glfusion_tpu.train import step as step_mod

    monkeypatch.setattr(step_mod, "default_compiler_options",
                        lambda *a, **k: {"xla_tpu_rwb_fusion": "false"})
    cfg, model, state, batch = _tiny_setup()
    step = step_mod.make_train_step(cfg, model, compiler_options=None)

    @jax.jit
    def chained(state, batch, rng):
        def body(carry, i):
            st, m = step(carry, batch, jax.random.fold_in(rng, i))
            return st, m["loss"]

        _, losses = jax.lax.scan(body, state, jnp.arange(2))
        return jnp.sum(losses)

    out = float(chained(state, batch, jax.random.PRNGKey(1)))
    assert np.isfinite(out)


def test_eval_step_options_plumbing(monkeypatch):
    from glfusion_tpu.train import step as step_mod

    monkeypatch.setattr(step_mod, "default_compiler_options",
                        lambda *a, **k: {"xla_tpu_rwb_fusion": "false"})
    cfg, model, state, batch = _tiny_setup()
    ev = step_mod.make_eval_step(cfg, model, compiler_options=None)

    @jax.jit
    def outer(state, batch):
        return ev(state, batch)["loss"]

    assert np.isfinite(float(outer(
        state, {"images": batch["images"], "masks": batch["masks"]})))

    ev_opts = step_mod.make_eval_step(cfg, model)  # default → attached

    @jax.jit
    def outer2(state, batch):
        return ev_opts(state, batch)["loss"]

    with pytest.raises(ValueError, match="nested"):
        outer2(state, {"images": batch["images"], "masks": batch["masks"]})
