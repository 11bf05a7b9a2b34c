"""Gradient accumulation (TrainConfig.grad_accum).

Under the reference's sum-reduction BCE (``main.py:87``) the accumulated
update is the SUM of per-microbatch gradients (plus the cycle-clip
gradient once). The oracle here computes that sum directly with the plain
step: one SGD(lr=1) step's update IS minus the gradient, so
``update(accum step on [m1;m2])`` must equal ``update(plain on m1) +
update(plain on m2)``. (BN train-mode moments are per-microbatch in both
forms, and running stats never enter the forward, so the decomposition is
exact in real arithmetic. A tiled-batch "big batch equals accumulation"
comparison is NOT usable as an oracle: f32 BN-backward cancellation makes
the N=4-moment and N=2-moment gradient paths differ elementwise by ~0.5 %
even though they agree in exact math — measured with the plain step
alone. Hence the norm-level tolerance.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glfusion_tpu.config import tiny_config
from glfusion_tpu.models import GlobalAndLocal
from glfusion_tpu.train.step import make_train_step
from glfusion_tpu.train.train_state import TrainState, make_optimizer


def _cfg(accum: int, **train_kw):
    cfg = tiny_config(views=("1", "4"))
    return dataclasses.replace(
        cfg,
        # dropout must be off for the tiled-batch oracle: the accumulated
        # step folds a fresh dropout rng per microbatch, the plain step
        # draws one mask for the whole batch
        model=dataclasses.replace(cfg.model, aspp_dropout=0.0),
        data=dataclasses.replace(cfg.data, crop_hw=16),
        train=dataclasses.replace(cfg.train, grad_accum=accum, **train_kw))


def _batch(cfg, n: int, with_clips: bool, seed: int = 7):
    hw = cfg.data.crop_hw
    v = cfg.model.num_views
    rng = jax.random.PRNGKey(seed)
    batch = {
        "images": jax.random.uniform(rng, (v, n, hw, hw, 1)),
        "masks": (jax.random.uniform(jax.random.fold_in(rng, 1),
                                     (v, n, hw, hw, 5))
                  > 0.5).astype(jnp.float32)}
    if with_clips:
        t = cfg.data.clip_length
        batch["clips"] = jax.random.uniform(
            jax.random.fold_in(rng, 2), (v, t, hw, hw, 1))
    return batch


def _state(cfg, model, batch, sgd: bool = False):
    """sgd=True uses a plain SGD tx for the exactness oracle: the update is
    LINEAR in the gradient, so accumulated-vs-plain agreement tests the
    gradient sum directly. (Adam's sign-like first step flips by ±lr on
    near-zero-gradient elements under mere float reassociation.)"""
    import optax

    variables = model.init(jax.random.PRNGKey(0), batch["images"], False)
    host = jax.device_get(variables)  # the step donates: keep host copies

    def make():
        v = jax.tree_util.tree_map(jnp.asarray, host)
        return TrainState.create(
            apply_fn=model.apply, params=v["params"],
            batch_stats=v.get("batch_stats", {}),
            tx=optax.sgd(1e-3) if sgd else make_optimizer(cfg, 10))

    return make


@pytest.mark.parametrize("with_clips", [True, False])
def test_accum_step_equals_summed_microbatch_grads(with_clips):
    accum = 2
    cfg = _cfg(accum, use_cycle=with_clips)
    model = GlobalAndLocal(cfg.model)
    full = _batch(cfg, n=2 * accum, with_clips=with_clips)
    # microbatch a = the contiguous slice the accum step scans; the cycle
    # clip contributes ONCE per update, so only microbatch 0's plain step
    # gets it (same rng split → same rng_cyc)
    micro = []
    for a in range(accum):
        mb = {"images": full["images"][:, 2 * a:2 * (a + 1)],
              "masks": full["masks"][:, 2 * a:2 * (a + 1)]}
        if with_clips and a == 0:
            mb["clips"] = full["clips"]
        micro.append(mb)
    make_state = _state(cfg, model, full, sgd=True)
    init = jax.device_get(make_state().params)
    rng = jax.random.PRNGKey(3)

    plain = make_train_step(_cfg(1, use_cycle=with_clips), model)
    upd, losses = [], []
    for mb in micro:
        st, m = plain(make_state(), dict(mb), rng)
        upd.append(jax.device_get(st.params))
        losses.append(float(m["loss"]))
    state_a, m_a = make_train_step(cfg, model)(make_state(), dict(full), rng)

    # summed per-microbatch gradients == the accumulated update, at norm
    # level (elementwise comparison is meaningless on near-cancelled BN
    # gradient components — see module docstring)
    for (ka, a), u0, u1, i in zip(
            jax.tree_util.tree_leaves_with_path(state_a.params),
            jax.tree_util.tree_leaves(upd[0]),
            jax.tree_util.tree_leaves(upd[1]),
            jax.tree_util.tree_leaves(init)):
        i = np.asarray(i)
        expected = (np.asarray(u0) - i) + (np.asarray(u1) - i)
        got = np.asarray(a) - i
        err = np.linalg.norm(got - expected)
        ref = np.linalg.norm(expected)
        # the absolute term covers leaves whose gradient nearly cancels
        # (e.g. the stem bias: O(0.1) summands cancelling to ~1e-6 — the
        # f32 noise floor there is set by the summands, not the result)
        assert err <= 1e-3 * ref + 1e-4, (jax.tree_util.keystr(ka), err, ref)
    np.testing.assert_allclose(float(m_a["loss"]), sum(losses), rtol=1e-5)


def test_accum_running_stats_thread_sequentially():
    """BN running stats after an accumulated step differ from the plain
    step's (momentum applies once per microbatch — the documented
    semantic), while the parameters do not."""
    accum = 2
    cfg = _cfg(accum, use_cycle=False)
    model = GlobalAndLocal(cfg.model)
    batch = _batch(cfg, n=2 * accum, with_clips=False)
    make_state = _state(cfg, model, batch)
    rng = jax.random.PRNGKey(3)

    state_a, _ = make_train_step(cfg, model)(make_state(), dict(batch), rng)
    state_p, _ = make_train_step(_cfg(1, use_cycle=False), model)(
        make_state(), dict(batch), rng)
    diff = max(float(jnp.abs(a - p).max()) for a, p in zip(
        jax.tree_util.tree_leaves(state_a.batch_stats),
        jax.tree_util.tree_leaves(state_p.batch_stats)))
    assert diff > 0.0


def test_accum_validations():
    cfg = _cfg(2, fuse_passes=True)
    model = GlobalAndLocal(cfg.model)
    with pytest.raises(ValueError, match="exclusive of fuse_passes"):
        make_train_step(cfg, model)
    with pytest.raises(ValueError, match="grad_accum must be"):
        make_train_step(_cfg(0), model)

    # batch not divisible into microbatches → trace-time error
    cfg = _cfg(2, use_cycle=False)
    step = make_train_step(cfg, model)
    batch = _batch(cfg, n=3, with_clips=False)
    make_state = _state(cfg, model, batch)
    with pytest.raises(ValueError, match="does not divide"):
        step(make_state(), batch, jax.random.PRNGKey(0))


def test_trainer_grad_accum_epoch(tmp_path):
    """End-to-end: the Trainer sizes loader batches by batch_size·accum and
    takes one optimizer update per group."""
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset
    from glfusion_tpu.train.trainer import Trainer

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, batch_size=1, grad_accum=2, num_epochs=1,
            save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "log"),
            eval_every_epochs=100, save_every_epochs=100))
    paths = generate_synthetic_dataset(tmp_path / "data", cfg.data,
                                       views=cfg.model.views, seed=0)
    tr = Trainer(cfg, data_paths=paths, verbose=False)
    n_train = len(tr.train_loader)
    assert tr.steps_per_epoch == max(n_train // 2, 1)
    m = tr._train_epoch(0)
    assert np.isfinite(m["loss"]) and m["steps"] == n_train // 2
