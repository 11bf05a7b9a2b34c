"""Loss numerics: BCE-sum vs torch; cycle loss vs an independent NumPy model.

The NumPy oracle below follows the soft-nearest-neighbor cycle description
(SURVEY.md §3.5) with plain loops — written independently from both the
reference tensor code and the JAX implementation.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import torch

from glfusion_tpu.train.losses import (
    bce_with_logits_sum,
    dense_seg_cycle_loss,
    seg_cycle_loss,
    _cycle_from_start,
)


def test_bce_sum_matches_torch():
    rs = np.random.RandomState(0)
    logits = rs.randn(4, 5, 16, 16).astype(np.float32) * 3
    target = (rs.rand(4, 5, 16, 16) > 0.5).astype(np.float32)
    ours = float(bce_with_logits_sum(jnp.asarray(logits), jnp.asarray(target)))
    ref = float(torch.nn.BCEWithLogitsLoss(reduction="sum")(
        torch.from_numpy(logits), torch.from_numpy(target)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def _numpy_cycle_oracle(feat, start, region, off, chunk, temp,
                        soft_label=False):
    """Loop-based soft-NN cycle loss for one start index."""
    t, d = feat.shape
    query, key = feat[:region], feat[region:]
    k = t - region
    s = region - (chunk + off) + 1

    qf = query[start:start + chunk]  # (chunk, d)
    # similarity of every shifted key window to the query chunk
    sim = np.empty(k - (chunk + off) + 1)
    for i in range(len(sim)):
        tot = 0.0
        for c in range(chunk):
            diff = key[(i + c) % k] - qf[c]
            tot += np.dot(diff, diff)
        sim[i] = -tot
    beta = np.exp(sim / d / chunk * temp)
    beta /= beta.sum()
    # soft-NN key window shifted by off
    weighted = np.zeros((chunk, d))
    for i, b in enumerate(beta):
        for c in range(chunk):
            weighted[c] += b * key[(i + off + c) % k]
    # cycle back to query windows
    q = region - off
    qc = feat[off:region]
    qsim = np.empty(q - chunk + 1)
    for i in range(len(qsim)):
        tot = 0.0
        for c in range(chunk):
            diff = qc[(i + c) % q] - weighted[c]
            tot += np.dot(diff, diff)
        qsim[i] = -tot / d / chunk * temp
    onehot = np.eye(s)[start]
    if soft_label:
        # reference main.py:792-794: softening applies to the BCE TARGET
        # only, after the similarities were computed from the hard start
        onehot = np.where(onehot == 1.0, 0.8, 0.2 / (s - 1))
    # mean-reduced BCE with logits
    x, y = qsim, onehot
    per = np.maximum(x, 0) - x * y + np.log1p(np.exp(-np.abs(x)))
    return per.mean()


def test_cycle_from_start_matches_numpy_oracle():
    rs = np.random.RandomState(1)
    region, off, chunk, temp = 8, 2, 3, 10.0
    feat = rs.randn(20, 6).astype(np.float32)
    s = region - (chunk + off) + 1
    for start in range(s):
        oracle = _numpy_cycle_oracle(feat, start, region, off, chunk, temp)
        onehot = jax.nn.one_hot(start, s)
        ours = float(_cycle_from_start(jnp.asarray(feat), onehot, region, off,
                                       chunk, temp))
        np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_seg_cycle_loss_runs_and_is_finite(rng):
    feat = jax.random.normal(rng, (40, 32))
    loss = seg_cycle_loss(jax.random.PRNGKey(3), feat, target_region=16,
                          cyc_off=2, chunk=3, temperature=10.0)
    assert np.isfinite(float(loss))


def test_dense_cycle_equals_mean_of_starts():
    rs = np.random.RandomState(2)
    region, off, chunk, temp = 8, 2, 3, 10.0
    feat = rs.randn(20, 6).astype(np.float32)
    s = region - (chunk + off) + 1
    expect = np.mean([_numpy_cycle_oracle(feat, st, region, off, chunk, temp)
                      for st in range(s)])
    ours = float(dense_seg_cycle_loss(jnp.asarray(feat), target_region=region,
                                      cyc_off=off, chunk=chunk,
                                      temperature=temp))
    np.testing.assert_allclose(ours, expect, rtol=1e-4, atol=1e-5)


def test_dense_cycle_soft_label_softens_target_only():
    """soft_label must soften the BCE target AFTER the hard-start window
    selection (reference main.py:792-794) — blending the selection one-hot
    would compute every distance on mixed features."""
    rs = np.random.RandomState(3)
    region, off, chunk, temp = 8, 2, 3, 10.0
    feat = rs.randn(20, 6).astype(np.float32)
    s = region - (chunk + off) + 1
    expect = np.mean([_numpy_cycle_oracle(feat, st, region, off, chunk, temp,
                                          soft_label=True)
                      for st in range(s)])
    ours = float(dense_seg_cycle_loss(jnp.asarray(feat), target_region=region,
                                      cyc_off=off, chunk=chunk,
                                      temperature=temp, soft_label=True))
    np.testing.assert_allclose(ours, expect, rtol=1e-4, atol=1e-5)


def test_cycle_loss_differentiable():
    feat = jax.random.normal(jax.random.PRNGKey(4), (20, 6))
    g = jax.grad(lambda f: dense_seg_cycle_loss(
        f, target_region=8, cyc_off=2, chunk=3, temperature=10.0))(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_cps_train_step_supervises_both_networks():
    """CPS (reference Global_and_Local_CPS, ours.py:3141): one step must
    update BOTH networks' params, and the cross-pseudo term must be active
    (loss differs from the no-CPS twin given identical inputs)."""
    import dataclasses

    import jax
    import numpy as np

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models import GlobalAndLocalCPS
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    cfg = tiny_config(views=("1", "4"))
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, variant="cps"),
        data=dataclasses.replace(cfg.data, crop_hw=16),
        train=dataclasses.replace(cfg.train, use_cycle=False))
    inner = dataclasses.replace(cfg.model, variant="global_and_local")
    model = GlobalAndLocalCPS(inner)
    hw = cfg.data.crop_hw
    v = cfg.model.num_views
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (v, 2, hw, hw, 1))
    masks = (jax.random.uniform(jax.random.fold_in(rng, 1),
                                (v, 2, hw, hw, 5)) > 0.5).astype(jnp.float32)
    variables = model.init(rng, imgs, False)
    # the train step donates its state arg; keep host copies so each state
    # starts from intact buffers and the originals stay comparable
    init_params = jax.device_get(variables["params"])
    init_bstats = jax.device_get(variables.get("batch_stats", {}))

    def fresh(tree):
        return jax.tree_util.tree_map(jnp.asarray, tree)

    def make_state():
        return TrainState.create(
            apply_fn=model.apply, params=fresh(init_params),
            batch_stats=fresh(init_bstats),
            tx=make_optimizer(cfg, 10))

    step = make_train_step(cfg, model, cps=True)
    state2, metrics = step(make_state(), {"images": imgs, "masks": masks},
                           jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))

    def delta(tree_a, tree_b):
        return max(float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree_util.tree_leaves(tree_a),
            jax.tree_util.tree_leaves(tree_b)))

    assert delta(state2.params["net1"], init_params["net1"]) > 0
    assert delta(state2.params["net2"], init_params["net2"]) > 0

    # the CPS term contributes: zeroing cps_weight changes the loss
    cfg0 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, cps_weight=0.0))
    step0 = make_train_step(cfg0, model, cps=True)
    _, m0 = step0(make_state(), {"images": imgs, "masks": masks},
                  jax.random.PRNGKey(2))
    assert float(m0["seg_loss"]) != float(metrics["seg_loss"])


def test_cycle_light_preserves_loss_math():
    """cycle_light skips the cycle forward's discarded heads: identical
    seg/cyc/total losses on the same params+batch, differing only in which
    BN running stats update."""
    import dataclasses

    import jax
    import numpy as np

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    cfg = tiny_config()
    model = GlobalAndLocal(cfg.model)
    hw, t = cfg.data.crop_hw, cfg.data.clip_length
    v = cfg.model.num_views
    rng = jax.random.PRNGKey(0)
    batch = {
        "images": jax.random.uniform(rng, (v, 2, hw, hw, 1)),
        "masks": (jax.random.uniform(jax.random.fold_in(rng, 1),
                                     (v, 2, hw, hw, 5)) > 0.5
                  ).astype(jnp.float32),
        "clips": jax.random.uniform(jax.random.fold_in(rng, 2),
                                    (v, t, hw, hw, 1)) * 255,
    }
    variables = model.init(rng, batch["images"], False)
    init_params = jax.device_get(variables["params"])
    init_bstats = jax.device_get(variables.get("batch_stats", {}))

    def run(cycle_light):
        c = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, cycle_light=cycle_light))
        state = TrainState.create(
            apply_fn=model.apply,
            params=jax.tree_util.tree_map(jnp.asarray, init_params),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, init_bstats),
            tx=make_optimizer(c, 10))
        step = make_train_step(c, model)
        state2, m = step(state, dict(batch), jax.random.PRNGKey(3))
        return state2, jax.device_get(m)

    s_full, m_full = run(False)
    s_light, m_light = run(True)
    assert np.isfinite(m_light["loss"])
    np.testing.assert_allclose(m_light["cyc_loss"], m_full["cyc_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(m_light["seg_loss"], m_full["seg_loss"],
                               rtol=1e-5)
    # full mode updated classifier BN stats on cycle frames; light didn't
    full_cls = np.concatenate([np.ravel(x) for x in
                               jax.tree_util.tree_leaves(
                                   jax.device_get(
                                       s_full.batch_stats["classifier"]))])
    light_cls = np.concatenate([np.ravel(x) for x in
                                jax.tree_util.tree_leaves(
                                    jax.device_get(
                                        s_light.batch_stats["classifier"]))])
    assert not np.allclose(full_cls, light_cls)


def test_chained_benchmark_keeps_cycle_heads_live():
    """Regression for the r2 benchmark-DCE bug: in a chained-scan timing
    harness whose output consumes only losses+params, XLA dead-code
    eliminates the cycle forward's head computations (live only through
    their BN running-stat updates), so the 'full' and cycle_light graphs
    compile identically and cycle_light measures neutral. The sound harness
    (bench.py) also consumes batch_stats; with it, full must cost strictly
    more FLOPs than cycle_light."""
    import dataclasses

    import jax

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    cfg = tiny_config()
    model = GlobalAndLocal(cfg.model)
    hw, t = cfg.data.crop_hw, cfg.data.clip_length
    v = cfg.model.num_views
    rng = jax.random.PRNGKey(0)
    batch = {
        "images": jax.random.uniform(rng, (v, 2, hw, hw, 1)),
        "masks": (jax.random.uniform(jax.random.fold_in(rng, 1),
                                     (v, 2, hw, hw, 5)) > 0.5
                  ).astype(jnp.float32),
        "clips": jax.random.uniform(jax.random.fold_in(rng, 2),
                                    (v, t, hw, hw, 1)) * 255,
    }
    variables = model.init(rng, batch["images"], False)

    def flops(cycle_light):
        c = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, cycle_light=cycle_light))
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=make_optimizer(c, 10))
        step = make_train_step(c, model)

        def chained(state, b, k):
            def body(carry, i):
                st, m = step(carry, b, jax.random.fold_in(k, i))
                return st, m["loss"]

            st, losses = jax.lax.scan(body, state, jnp.arange(2))
            tot = jnp.sum(losses)
            for leaf in jax.tree_util.tree_leaves(st.params):
                tot += jnp.max(jnp.abs(leaf)).astype(jnp.float32)
            for leaf in jax.tree_util.tree_leaves(st.batch_stats):
                tot += jnp.mean(leaf).astype(jnp.float32)
            return tot

        comp = jax.jit(chained).lower(
            state, batch, jax.random.PRNGKey(3)).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"]) if ca and ca.get("flops") else None

    f_full, f_light = flops(False), flops(True)
    if f_full is None or f_light is None:
        pytest.skip("cost_analysis unavailable on this backend")
    assert f_full > 1.02 * f_light, (f_full, f_light)


def test_checkify_train_step_catches_nan_inputs():
    """cfg.train.checkify (reference main.py:37 set_detect_anomaly): a
    clean batch steps normally; a NaN-poisoned batch raises a checkify
    error naming the failing in-graph check instead of silently producing
    NaN params."""
    import dataclasses

    import jax
    import numpy as np
    from jax.experimental import checkify

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    cfg = tiny_config(views=("1", "4"))
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, crop_hw=16),
        train=dataclasses.replace(cfg.train, use_cycle=False,
                                  checkify=True))
    model = GlobalAndLocal(cfg.model)
    hw, v = cfg.data.crop_hw, cfg.model.num_views
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (v, 2, hw, hw, 1))
    masks = (jax.random.uniform(jax.random.fold_in(rng, 1),
                                (v, 2, hw, hw, 5)) > 0.5).astype(jnp.float32)
    variables = model.init(rng, imgs, False)
    init_params = jax.device_get(variables["params"])
    init_bstats = jax.device_get(variables.get("batch_stats", {}))

    def make_state():
        fresh = jax.tree_util.tree_map(jnp.asarray, init_params)
        fresh_bs = jax.tree_util.tree_map(jnp.asarray, init_bstats)
        return TrainState.create(apply_fn=model.apply, params=fresh,
                                 batch_stats=fresh_bs,
                                 tx=make_optimizer(cfg, 10))

    step = make_train_step(cfg, model)

    # clean batch: steps normally, finite loss
    state2, metrics = step(make_state(), {"images": imgs, "masks": masks},
                           jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))

    # NaN-poisoned images: the instrumented step must throw, not train.
    # Throws are deferred by ONE step (the fetch overlaps the next step's
    # execution instead of serializing dispatch), so the error surfaces on
    # the next call or on the epoch-end flush the Trainer performs.
    bad = imgs.at[0, 0, 0, 0, 0].set(jnp.nan)
    step(make_state(), {"images": bad, "masks": masks},
         jax.random.PRNGKey(2))  # clean pending error throws as a no-op
    with pytest.raises(checkify.JaxRuntimeError, match="nan"):
        step.checkify_flush()


def test_per_pass_remat_step_is_exact():
    """``make_train_step(..., sup_model=no-remat twin)`` (per-pass remat:
    only the cycle forward recomputes) must be EXACTLY the both-remat step:
    ``nn.remat`` preserves the variable tree and recomputes the same math,
    so losses and the updated state agree leaf-for-leaf."""
    import dataclasses

    import jax
    import numpy as np

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, remat=True))
    model = GlobalAndLocal(cfg.model)
    sup_model = GlobalAndLocal(
        dataclasses.replace(cfg.model, remat=False, remat_stages=None))
    hw, t = cfg.data.crop_hw, cfg.data.clip_length
    v = cfg.model.num_views
    rng = jax.random.PRNGKey(0)
    batch = {
        "images": jax.random.uniform(rng, (v, 2, hw, hw, 1)),
        "masks": (jax.random.uniform(jax.random.fold_in(rng, 1),
                                     (v, 2, hw, hw, 5)) > 0.5
                  ).astype(jnp.float32),
        "clips": jax.random.uniform(jax.random.fold_in(rng, 2),
                                    (v, t, hw, hw, 1)) * 255,
    }
    variables = model.init(rng, batch["images"], False)
    # the twin consumes the rematted model's variables as-is
    jax.eval_shape(lambda vs: sup_model.apply(vs, batch["images"], False),
                   variables)
    init = jax.device_get(variables)

    def run(sm):
        state = TrainState.create(
            apply_fn=model.apply,
            params=jax.tree_util.tree_map(jnp.asarray, init["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.asarray, init.get("batch_stats", {})),
            tx=make_optimizer(cfg, 10))
        step = make_train_step(cfg, model, sup_model=sm)
        state2, m = step(state, dict(batch), jax.random.PRNGKey(3))
        return jax.device_get((state2.params, state2.batch_stats, m))

    p_base, bs_base, m_base = run(None)
    p_pp, bs_pp, m_pp = run(sup_model)
    np.testing.assert_allclose(m_pp["loss"], m_base["loss"], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves((p_base, bs_base)),
                    jax.tree_util.tree_leaves((p_pp, bs_pp))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_fuse_passes_step_matches_cycle_light_on_uniform_frames():
    """TrainConfig.fuse_passes merges the supervised and cycle forwards
    into one backbone pass. The only numeric divergence from cycle_light
    is BN batch moments (merged batch vs two per-pass batches), so with
    every frame identical (per view) and dropout off, the fused step's
    losses must equal the cycle_light step's."""
    import dataclasses

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, aspp_dropout=0.0))
    model = GlobalAndLocal(cfg.model)
    hw, t = cfg.data.crop_hw, cfg.data.clip_length
    v = cfg.model.num_views
    rs = np.random.RandomState(0)
    frame = rs.rand(v, 1, hw, hw, 1).astype(np.float32)
    batch = {
        "images": jnp.asarray(np.broadcast_to(frame, (v, 2, hw, hw, 1))),
        "masks": jnp.asarray(
            (rs.rand(v, 2, hw, hw, 5) > 0.5).astype(np.float32)),
        "clips": jnp.asarray(np.broadcast_to(frame, (v, t, hw, hw, 1))),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["images"], False)
    init = jax.device_get(variables)

    def run(**train_kw):
        c = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, **train_kw))
        fresh = jax.tree_util.tree_map(jnp.asarray, init)
        state = TrainState.create(
            apply_fn=model.apply, params=fresh["params"],
            batch_stats=fresh.get("batch_stats", {}),
            tx=make_optimizer(c, 10))
        state2, m = make_train_step(c, model)(
            state, dict(batch), jax.random.PRNGKey(3))
        return state2, jax.device_get(m)

    s_fused, m_fused = run(fuse_passes=True)
    _, m_light = run(cycle_light=True)
    assert np.isfinite(m_fused["loss"])
    np.testing.assert_allclose(m_fused["seg_loss"], m_light["seg_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(m_fused["cyc_loss"], m_light["cyc_loss"],
                               rtol=1e-5)
    # the fused step actually updated parameters
    changed = any(
        not np.allclose(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(s_fused.params)),
            jax.tree_util.tree_leaves(init["params"])))
    assert changed


def test_fuse_passes_rejects_cps_and_sup_model():
    import dataclasses

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.train.step import make_train_step

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, fuse_passes=True))
    model = GlobalAndLocal(cfg.model)
    with pytest.raises(ValueError, match="exclusive"):
        make_train_step(cfg, model, cps=True)
    with pytest.raises(ValueError, match="merged pass"):
        make_train_step(cfg, model, sup_model=model)
