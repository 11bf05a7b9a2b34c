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


@pytest.mark.smoke
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


# ---------------------------------------------------------------------------
# Knob interaction matrix: --grad-accum × --mesh-model × cycle_light /
# fuse_passes / dense_cyc × --variant cps/temporal landed in separate
# rounds; this pins that the VALID combinations run one step together on
# the virtual mesh and the INVALID ones fail loudly (TrainConfig knobs +
# make_train_step/Trainer guards).
# ---------------------------------------------------------------------------

def _matrix_setup(accum, mesh_model, cfg_kw, variant="global_and_local"):
    import dataclasses

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models.registry import build_seg_model
    from glfusion_tpu.parallel import make_mesh, shard_batch, shard_variables
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, variant=variant),
        train=dataclasses.replace(cfg.train, grad_accum=accum,
                                  mesh_model=mesh_model, **cfg_kw))
    model, cps = build_seg_model(cfg.model)
    mesh = make_mesh(data=-1, model=mesh_model)
    v, hw, t = cfg.model.num_views, cfg.data.crop_hw, cfg.data.clip_length
    n = 4 * accum  # frames per view per optimizer update
    x = jnp.asarray(np.random.RandomState(0).rand(v, n, hw, hw, 1),
                    jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, False))(
        jax.random.PRNGKey(0))
    variables = shard_variables(variables, mesh)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, 4))
    batch = shard_batch({
        "images": x,
        "masks": jnp.asarray(
            np.random.RandomState(1).rand(v, n, hw, hw, 5) > 0.5,
            jnp.float32),
        "clips": jnp.asarray(
            np.random.RandomState(2).rand(v, t, hw, hw, 1), jnp.float32),
    }, mesh, batch_axis=1)
    return cfg, model, cps, state, batch


@pytest.mark.parametrize("accum,mesh_model,cfg_kw,variant", [
    # accum × TP mesh × each r2/r3 knob, plus knob pairs that are allowed
    (2, 2, {}, "global_and_local"),
    (1, 2, {"cycle_light": True}, "global_and_local"),
    (2, 1, {"dense_cyc": True}, "global_and_local"),
    (1, 2, {"fuse_passes": True}, "global_and_local"),
    (2, 2, {"temporal": True}, "global_and_local"),
    (1, 2, {}, "cps"),
    (2, 1, {"dense_cyc": True}, "cps"),
    (1, 1, {"cycle_light": True, "temporal": True}, "global_and_local"),
], ids=["accum2-tp2", "tp2-cyclight", "accum2-densecyc", "tp2-fusepasses",
        "accum2-tp2-temporal", "tp2-cps", "accum2-cps-densecyc",
        "cyclight-temporal"])
def test_knob_matrix_valid_combinations_run_one_step(
        accum, mesh_model, cfg_kw, variant):
    from glfusion_tpu.train.step import make_train_step

    cfg, model, cps, state, batch = _matrix_setup(accum, mesh_model, cfg_kw,
                                                  variant)
    step = make_train_step(cfg, model, cps=cps)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"])), (cfg_kw, metrics)
    # exactly one optimizer update applied regardless of accum/knobs
    assert int(new_state.step) == 1


@pytest.mark.parametrize("accum,cfg_kw,variant,match", [
    (1, {"fuse_passes": True}, "cps", "exclusive"),
    (1, {"fuse_passes": True, "temporal": True}, "global_and_local",
     "exclusive"),
    (2, {"fuse_passes": True}, "global_and_local", "exclusive"),
    (0, {}, "global_and_local", "grad_accum"),
], ids=["fusepasses-cps", "fusepasses-temporal", "fusepasses-accum2",
        "accum0"])
def test_knob_matrix_invalid_combinations_raise(accum, cfg_kw, variant,
                                                match):
    import dataclasses

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models.registry import build_seg_model
    from glfusion_tpu.train.step import make_train_step

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, variant=variant),
        train=dataclasses.replace(cfg.train, grad_accum=accum, **cfg_kw))
    model, cps = build_seg_model(cfg.model)
    with pytest.raises(ValueError, match=match):
        make_train_step(cfg, model, cps=cps)


@pytest.mark.parametrize("train_kw,model_kw,match", [
    ({"cycle_light": True}, {"arch": "unet"}, "cycle_light"),
    ({"cycle_light": True}, {"variant": "fg_bg"}, "cycle_light"),
    ({"temporal": True}, {"variant": "cps"}, "temporal"),
    ({"fuse_passes": True}, {"variant": "local_only"}, "fuse_passes"),
], ids=["cyclight-unet", "cyclight-fgbg", "temporal-cps",
        "fusepasses-localonly"])
def test_knob_matrix_trainer_level_guards(tmp_path, train_kw, model_kw,
                                          match):
    """Trainer rejects arch/variant-incompatible knob combinations BEFORE
    any expensive work (the guards at trainer.py __init__)."""
    import dataclasses

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset
    from glfusion_tpu.train.trainer import Trainer

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, **model_kw),
        train=dataclasses.replace(cfg.train, **train_kw,
                                  save_dir=str(tmp_path / "ckpt"),
                                  log_dir=str(tmp_path / "log")))
    paths = generate_synthetic_dataset(str(tmp_path / "data"), cfg.data,
                                       views=cfg.model.views, seed=0)
    with pytest.raises(ValueError, match=match):
        Trainer(cfg, data_paths=paths, verbose=False)
