"""Model shape contracts and TPAVI numerics.

Shape contracts mirror the reference smoke blocks (SURVEY.md §4):
112² input → 110² stem → 55² post-pool → 28² f4 (models/_utils.py:214-217).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glfusion_tpu.config import ModelConfig, tiny_config
from glfusion_tpu.models import GlobalAndLocal, DeepLabHead, ResNetIEKD, TPAVI
from glfusion_tpu.ops.nonlocal_attn import dot_nonlocal_attention


def test_resnet_feature_map_28x28_at_full_width():
    """Full-size stem contract on a thin-but-deep net (widths shrunk for CPU)."""
    net = ResNetIEKD(stem_width=8, block_sizes=(1, 1, 1, 1), widths=(4, 8, 16, 32))
    x = jnp.zeros((1, 112, 112, 1))
    vars_ = net.init(jax.random.PRNGKey(0), x, False)
    y = net.apply(vars_, x, False)
    assert y.shape == (1, 28, 28, 32 * 4)


def test_resnet_dilation_keeps_size_after_layer2():
    net = ResNetIEKD(stem_width=8, block_sizes=(1, 1, 1, 1), widths=(4, 8, 16, 32))
    x = jnp.zeros((2, 64, 64, 1))
    vars_ = net.init(jax.random.PRNGKey(0), x, False)
    y = net.apply(vars_, x, False)
    # 64 → 62 (stem) → 31 (pool) → 16 (layer2 stride 2), layer3/4 dilated keep 16
    assert y.shape == (2, 16, 16, 128)


def test_deeplab_head_shapes():
    head = DeepLabHead(num_outputs=5, channels=16, rates=(2, 4, 6))
    x = jnp.zeros((2, 8, 8, 64))
    vars_ = head.init(jax.random.PRNGKey(0), x, False)
    y = head.apply(vars_, x, False)
    assert y.shape == (2, 8, 8, 5)


def test_nonlocal_attention_reassoc_equals_naive():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    theta = jax.random.normal(k1, (2, 75, 16))
    phi = jax.random.normal(k2, (2, 75, 16))
    g = jax.random.normal(k3, (2, 75, 16))
    naive = dot_nonlocal_attention(theta, phi, g, impl="naive")
    reassoc = dot_nonlocal_attention(theta, phi, g, impl="reassoc")
    np.testing.assert_allclose(np.asarray(naive), np.asarray(reassoc),
                               atol=1e-4, rtol=1e-4)


def test_tpavi_init_is_layernorm_of_input():
    """Zero-init W_z BN (reference ours.py:826-827) → block is LN(x) at init."""
    m = TPAVI(inter_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 4, 4, 16))
    vars_ = m.init(jax.random.PRNGKey(0), x, False)
    y = m.apply(vars_, x, False)
    # LayerNorm over channel of x itself
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    expected = (x - mu) / jnp.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)


def test_tpavi_matches_reference_formula():
    """End-to-end TPAVI vs a direct dense-math transcription of the torch ops."""
    m = TPAVI(inter_channels=6, attn_impl="naive")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 4, 5, 12))
    vars_ = m.init(jax.random.PRNGKey(0), x, True)
    p = vars_["params"]
    # overwrite zero BN scale so the attention path actually contributes
    p = jax.tree_util.tree_map(lambda a: a, p)
    import flax
    p = flax.core.unfreeze(p)
    p["w_z_bn"]["scale"] = jnp.ones_like(p["w_z_bn"]["scale"]) * 0.7
    p["w_z_bn"]["bias"] = jnp.ones_like(p["w_z_bn"]["bias"]) * 0.1
    vars_ = {"params": p, "batch_stats": vars_["batch_stats"]}

    y = m.apply(vars_, x, False)

    # independent NumPy re-derivation
    b, v, h, w, c = x.shape
    n = v * h * w
    tok = np.asarray(x).reshape(b, n, c)

    def dense(name, t):
        k = np.asarray(p[name]["kernel"])
        bi = np.asarray(p[name]["bias"])
        return t @ k + bi

    theta, phi, g = dense("theta", tok), dense("phi", tok), dense("g", tok)
    f = np.einsum("bic,bjc->bij", theta, phi)
    yy = np.einsum("bij,bjd->bid", f / n, g)
    wy = dense("w_z_conv", yy)
    # eval-mode BN with init stats (mean 0 var 1)
    wy = wy / np.sqrt(1 + 1e-5) * 0.7 + 0.1
    z = wy + tok
    mu = z.mean(-1, keepdims=True)
    var = z.var(-1, keepdims=True)
    ln_scale = np.asarray(p["norm"]["scale"])
    ln_bias = np.asarray(p["norm"]["bias"])
    expected = ((z - mu) / np.sqrt(var + 1e-5)) * ln_scale + ln_bias
    np.testing.assert_allclose(np.asarray(y).reshape(b, n, c), expected,
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("variant", ["global_and_local", "global_only",
                                     "local_only", "cyc_nofusion"])
def test_global_and_local_forward_shapes(variant):
    cfg = tiny_config().model
    cfg = ModelConfig(**{**cfg.__dict__, "variant": variant})
    model = GlobalAndLocal(cfg)
    x = jnp.zeros((3, 2, 32, 32, 1))
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(vars_, x, False)
    assert out["mask"].shape == (3, 2, 32, 32, 5)
    assert out["mask_bb"].shape == (3, 2, 32, 32, 5)
    assert out["f4_global"].shape[0] == 3
    if variant == "local_only":
        # reference Local_only returns the 1-ch atten_map in the cycle
        # slot (ours.py:2249)
        assert out["f4_global"].shape[-1] == 1
    else:
        assert out["f4_global"].shape == out["f4_local"].shape


def test_global_and_local_per_view_params_are_stacked():
    cfg = tiny_config().model
    model = GlobalAndLocal(cfg)
    x = jnp.zeros((3, 1, 32, 32, 1))
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    stem = vars_["params"]["backbone"]["stem_conv"]["kernel"]
    assert stem.shape[0] == 3  # leading view axis
    # every view starts with IDENTICAL weights — the reference deep-copies
    # ONE instance per view (ours.py:1724-1744); views diverge only through
    # their per-view gradients
    np.testing.assert_array_equal(np.asarray(stem[0]), np.asarray(stem[1]))


@pytest.mark.smoke
def test_global_and_local_train_mode_updates_batch_stats():
    cfg = tiny_config().model
    model = GlobalAndLocal(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 32, 32, 1))
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    out, updates = model.apply(vars_, x, True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(5)})
    assert "batch_stats" in updates
    old = vars_["batch_stats"]["backbone"]["stem_bn"]["mean"]
    new = updates["batch_stats"]["backbone"]["stem_bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


@pytest.mark.parametrize("variant", ["conv_merge", "fg_bg", "early_fusion",
                                     "late_fusion"])
def test_variant_forward_shapes(variant):
    cfg = tiny_config().model
    cfg = ModelConfig(**{**cfg.__dict__, "variant": variant})
    model = GlobalAndLocal(cfg)
    x = jnp.zeros((3, 2, 32, 32, 1))
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(vars_, x, False)
    assert out["mask"].shape == (3, 2, 32, 32, 5)


def test_variant_cycle_feature_slots():
    """The cycle-feature slot ('f4_global') must match each reference
    class's 3rd return value: cyc_nofusion → RAW f4 (ours.py:2763),
    local_only → atten_map (:2249), fg_bg → global+local f4_fusion
    (:3024), global_and_local → attended global (:1843)."""
    import flax

    x = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 32, 32, 1))

    def run(variant, **apply_kw):
        cfg = ModelConfig(**{**tiny_config().model.__dict__,
                             "variant": variant})
        model = GlobalAndLocal(cfg)
        vars_ = model.init(jax.random.PRNGKey(0), x, False)
        return model, vars_, model.apply(vars_, x, False, **apply_kw)

    # cyc_nofusion: full-fusion mask graph, raw-f4 cycle features — the
    # features_only fast path returns the same raw f4
    model, vars_, out = run("cyc_nofusion")
    feat_only = model.apply(vars_, x, False, features_only=True)
    np.testing.assert_array_equal(np.asarray(out["f4_global"]),
                                  np.asarray(feat_only["f4_global"]))
    # its mask comes from the FUSED features: same params as
    # global_and_local (identical tree) give the identical mask
    model_gl, vars_gl, out_gl = run("global_and_local")
    assert (jax.tree_util.tree_structure(vars_["params"])
            == jax.tree_util.tree_structure(vars_gl["params"]))
    np.testing.assert_array_equal(np.asarray(out["mask"]),
                                  np.asarray(out_gl["mask"]))
    # ...but global_and_local's cycle slot is the ATTENDED global
    np.testing.assert_array_equal(
        np.asarray(out_gl["f4_global"]),
        np.asarray(model_gl.apply(vars_gl, x, False,
                                  features_only=True)["f4_global"]))

    # local_only: cycle slot is the (V, B, h, w, 1) atten map in (0, 1)
    _, _, out_lo = run("local_only")
    a = np.asarray(out_lo["f4_global"])
    assert a.shape[-1] == 1 and (a > 0).all() and (a < 1).all()

    # fg_bg: cycle slot = f4_global_fusion + f4_local_fusion; recover the
    # two attention outputs from intermediates to check the sum
    cfg = ModelConfig(**{**tiny_config().model.__dict__, "variant": "fg_bg"})
    model = GlobalAndLocal(cfg)
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    out, inter = model.apply(vars_, x, False, capture_intermediates=True)
    ints = flax.traverse_util.flatten_dict(inter["intermediates"])
    attn_out = {k[0]: v[0] for k, v in ints.items()
                if k[-1] == "__call__" and len(k) == 2
                and k[0] in ("global_attn", "local_attn")}
    fusion = (jnp.swapaxes(attn_out["global_attn"], 0, 1)
              + jnp.swapaxes(attn_out["local_attn"], 0, 1))
    np.testing.assert_allclose(np.asarray(out["f4_global"]),
                               np.asarray(fusion), rtol=1e-6, atol=1e-6)
    # fg_bg / local_only refuse the features_only fast path
    for bad in ("fg_bg", "local_only"):
        cfg = ModelConfig(**{**tiny_config().model.__dict__,
                             "variant": bad})
        m = GlobalAndLocal(cfg)
        with pytest.raises(ValueError, match="features_only"):
            m.init(jax.random.PRNGKey(0), x, False, features_only=True)


def test_temporal_video_mode_folds_frames_into_tokens():
    """Global_and_Local_Temporal intent (reference ours.py:1959-1980)."""
    cfg = tiny_config().model
    model = GlobalAndLocal(cfg)
    import flax
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 32, 32, 1))  # T=4
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    # un-zero the TPAVI out-proj BN so the attention path contributes
    # (zero-init makes the block LN(x) regardless of tokens at init)
    p = flax.core.unfreeze(vars_["params"])
    for attn in ("global_attn", "local_attn"):
        p[attn]["w_z_bn"]["scale"] = (
            jnp.ones_like(p[attn]["w_z_bn"]["scale"]))
    vars_ = {"params": p, "batch_stats": vars_["batch_stats"]}
    out = model.apply(vars_, x, False, True)  # is_video=True
    assert out["mask"].shape == (3, 4, 32, 32, 5)
    # video mode attends across frames → differs from per-frame attention
    out_frame = model.apply(vars_, x, False, False)
    assert not np.allclose(np.asarray(out["mask"]),
                           np.asarray(out_frame["mask"]), atol=1e-6)


def test_cps_twin_returns_two_independent_predictions():
    from glfusion_tpu.models import GlobalAndLocalCPS
    cfg = tiny_config().model
    model = GlobalAndLocalCPS(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 32, 32, 1))
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(vars_, x, False)
    assert out["mask"].shape == out["mask_2"].shape == (3, 1, 32, 32, 5)
    # independently initialized twins → different predictions
    assert not np.allclose(np.asarray(out["mask"]),
                           np.asarray(out["mask_2"]), atol=1e-6)


@pytest.mark.parametrize("ctor_kw", [
    dict(),
    dict(recurrent=True),
    dict(attention=True),
    dict(recurrent=True, attention=True),
])
def test_unet_family_shapes(ctor_kw):
    from glfusion_tpu.models import UNet
    model = UNet(out_channels=5, widths=(4, 8, 12, 16, 20), **ctor_kw)
    x = jnp.zeros((2, 32, 32, 1))
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    y = model.apply(vars_, x, False)
    assert y.shape == (2, 32, 32, 5)


@pytest.mark.parametrize("fuse", [False, True])
def test_multiview_unet_shapes(fuse):
    from glfusion_tpu.models import MultiviewUNet
    model = MultiviewUNet(num_classes=5, widths=(4, 8, 12, 16, 20), fuse=fuse)
    x = jnp.zeros((3, 2, 32, 32, 1))
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(vars_, x, False)
    assert out["mask"].shape == (3, 2, 32, 32, 5)
    assert out["bottleneck"].shape == (3, 2, 2, 2, 20)


def test_remat_stages_mask_and_validation():
    """Per-stage remat masks (ModelConfig.remat_stages): a partial mask
    trains (grads flow, remat is bit-exact recompute), and a mask whose
    length mismatches block_sizes raises at trace time instead of an
    opaque IndexError mid-trace."""
    import numpy as np
    import pytest

    from glfusion_tpu.models.resnet import ResNetIEKD

    kw = dict(stem_width=4, block_sizes=(1, 1, 1, 1), widths=(2, 4, 6, 8))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1), jnp.float32)

    plain = ResNetIEKD(**kw)
    v = plain.init(jax.random.PRNGKey(0), x, False)
    ref = plain.apply(v, x, False)

    masked = ResNetIEKD(**kw, remat=True,
                        remat_stages=(True, True, False, False))
    # same params apply (remat recomputes the same math)
    out = masked.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    def loss(p):
        o, _ = masked.apply({"params": p, "batch_stats": v["batch_stats"]},
                            x, True, mutable=["batch_stats"])
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree_util.tree_leaves(g))

    bad = ResNetIEKD(**kw, remat_stages=(True, False))
    with pytest.raises(ValueError, match="remat_stages"):
        bad.init(jax.random.PRNGKey(0), x, False)


def test_raw_scope_params_match_linen_submodule_trees():
    """The two places params are created via raw ``scope.push(...).param``
    (the IEKD stem conv, models/resnet.py _stem_conv; the TPAVI eval-fused
    θ/φ/g projection, models/tpavi.py) must stay path-, shape-, AND
    value-identical to the equivalent nn.Conv / nn.Dense submodules, or
    checkpoints and the torch converter silently break (advisor finding,
    ADVICE.md r2)."""
    from flax import linen as nn
    from flax.traverse_util import flatten_dict

    # --- stem: IEKDStem's scope.push("stem_conv") vs a plain nn.Conv
    from glfusion_tpu.models.resnet import IEKDStem

    class _LinenStem(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            from glfusion_tpu.models.resnet import _BN
            from glfusion_tpu.ops.pooling import max_pool_3x3_s2
            x = nn.Conv(4, (7, 7), padding=((2, 2), (2, 2)),
                        name="stem_conv")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name="stem_bn", **_BN)(x)
            return max_pool_3x3_s2(nn.relu(x))

    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1), jnp.float32)
    raw = IEKDStem(stem_width=4).init(jax.random.PRNGKey(7), x, False)
    lin = _LinenStem().init(jax.random.PRNGKey(7), x, False)
    raw_flat = flatten_dict(raw["params"])
    lin_flat = flatten_dict(lin["params"])
    assert set(raw_flat) == set(lin_flat)
    for k in raw_flat:
        np.testing.assert_array_equal(np.asarray(raw_flat[k]),
                                      np.asarray(lin_flat[k]), err_msg=str(k))
    out_raw = IEKDStem(stem_width=4).apply(raw, x, False)
    out_lin = _LinenStem().apply(lin, x, False)
    np.testing.assert_allclose(np.asarray(out_raw), np.asarray(out_lin),
                               rtol=1e-6, atol=1e-6)

    # --- TPAVI: eval init (fused scope-API θ/φ/g) vs train init (nn.Dense)
    feat = jnp.asarray(np.random.RandomState(1).rand(1, 2, 4, 4, 8),
                       jnp.float32)
    attn = TPAVI(inter_channels=4)
    v_eval = attn.init(jax.random.PRNGKey(3), feat, False)   # fused path
    v_train = attn.init(jax.random.PRNGKey(3), feat, True)   # nn.Dense path
    ef = flatten_dict(v_eval["params"])
    tf = flatten_dict(v_train["params"])
    assert set(ef) == set(tf)
    for k in ef:
        np.testing.assert_array_equal(np.asarray(ef[k]), np.asarray(tf[k]),
                                      err_msg=str(k))


def test_temporal_variant_trains_one_step():
    """--variant temporal (Global_and_Local_Temporal intent, reference
    ours.py:1846-1980): the cycle forward folds clip frames into the
    attention token axis. One full train step must run with finite loss,
    and the cycle loss must differ from the per-frame (non-temporal) path
    (different attention graph ⇒ different features)."""
    from dataclasses import replace

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer
    from glfusion_tpu.models import GlobalAndLocal

    import flax

    cfg0 = tiny_config()
    model = GlobalAndLocal(cfg0.model)
    v, b = cfg0.model.num_views, 2
    hw, t = cfg0.data.crop_hw, cfg0.data.clip_length
    x = jnp.zeros((v, b, hw, hw, 1), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, False))(
        jax.random.PRNGKey(0))
    # un-zero the TPAVI out-proj BN scale: at init the attention block is
    # LN(x) regardless of token structure, which would make the temporal
    # and per-frame cycle features trivially equal
    p = flax.core.unfreeze(variables["params"])
    for attn in ("global_attn", "local_attn"):
        p[attn]["w_z_bn"]["scale"] = jnp.ones_like(
            p[attn]["w_z_bn"]["scale"])
    variables = {"params": p, "batch_stats": variables["batch_stats"]}
    batch = {
        "images": jnp.asarray(
            np.random.RandomState(0).rand(v, b, hw, hw, 1), jnp.float32),
        "masks": jnp.asarray(
            np.random.RandomState(1).rand(v, b, hw, hw, 5) > 0.5,
            jnp.float32),
        "clips": jnp.asarray(
            np.random.RandomState(2).rand(v, t, hw, hw, 1), jnp.float32),
    }

    def run(temporal):
        cfg = replace(cfg0, train=replace(cfg0.train, temporal=temporal))
        # fresh buffers per run: the step donates its state argument
        fresh = jax.tree_util.tree_map(jnp.array, variables)
        state = TrainState.create(
            apply_fn=model.apply, params=fresh["params"],
            batch_stats=fresh.get("batch_stats", {}),
            tx=make_optimizer(cfg, 1))
        _, metrics = make_train_step(cfg, model)(
            state, batch, jax.random.PRNGKey(1))
        return {k: float(v) for k, v in metrics.items()
                if k in ("loss", "seg_loss", "cyc_loss")}

    m_t = run(True)
    m_f = run(False)
    assert np.isfinite(m_t["loss"]) and m_t["cyc_loss"] != 0.0
    # same supervised graph, different cycle graph
    np.testing.assert_allclose(m_t["seg_loss"], m_f["seg_loss"], rtol=1e-6)
    assert m_t["cyc_loss"] != m_f["cyc_loss"]


def test_temporal_composes_with_cycle_light():
    """cycle_light + temporal: the fast features-only cycle forward also
    supports the video token fold."""
    from dataclasses import replace

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer
    from glfusion_tpu.models import GlobalAndLocal

    cfg = tiny_config()
    cfg = replace(cfg, train=replace(cfg.train, temporal=True,
                                     cycle_light=True))
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
        "images": jnp.zeros((v, b, hw, hw, 1), jnp.float32),
        "masks": jnp.zeros((v, b, hw, hw, 5), jnp.float32),
        "clips": jnp.asarray(
            np.random.RandomState(2).rand(v, t, hw, hw, 1), jnp.float32),
    }
    _, metrics = make_train_step(cfg, model)(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["cyc_loss"]) != 0.0


@pytest.mark.parametrize("variant",
                         ["global_and_local", "cyc_nofusion", "early_fusion"])
def test_fused_pass_eval_slices_exactly(variant):
    """sup_count (the fused supervised+cycle pass, TrainConfig.fuse_passes):
    in eval mode (running BN stats, no dropout) the merged pass must
    reproduce the separate supervised forward and the features_only cycle
    forward exactly — the split after the backbone/attention is pure
    slicing."""
    from dataclasses import replace

    import flax

    cfg = tiny_config()
    cfg = replace(cfg, model=replace(cfg.model, variant=variant))
    model = GlobalAndLocal(cfg.model)
    v, b, t = cfg.model.num_views, 2, 6
    hw = cfg.data.crop_hw
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(v, b, hw, hw, 1), jnp.float32)
    clips = jnp.asarray(rs.rand(v, t, hw, hw, 1), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, images, False))(
        jax.random.PRNGKey(0))
    # un-zero the TPAVI out-proj BN scale so the attention output actually
    # depends on its input (at init the block reduces to LN(x))
    if variant == "global_and_local":
        p = flax.core.unfreeze(variables["params"])
        for attn in ("global_attn", "local_attn"):
            p[attn]["w_z_bn"]["scale"] = jnp.ones_like(
                p[attn]["w_z_bn"]["scale"])
        variables = {"params": p, "batch_stats": variables["batch_stats"]}

    xcat = jnp.concatenate([images, clips], axis=1)
    out_f = model.apply(variables, xcat, False, sup_count=b)
    out_s = model.apply(variables, images, False)
    out_c = model.apply(variables, clips, False, features_only=True)

    assert out_f["mask"].shape == (v, b, hw, hw, 5)
    assert out_f["f4_global"].shape[:2] == (v, t)
    np.testing.assert_allclose(np.asarray(out_f["mask"]),
                               np.asarray(out_s["mask"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["mask_bb"]),
                               np.asarray(out_s["mask_bb"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["f4_global"]),
                               np.asarray(out_c["f4_global"]),
                               rtol=1e-5, atol=1e-5)


def test_fused_pass_rejects_unsupported_modes():
    from dataclasses import replace

    cfg = tiny_config()
    v, hw = cfg.model.num_views, cfg.data.crop_hw
    x = jnp.zeros((v, 4, hw, hw, 1), jnp.float32)
    for bad in ("fg_bg", "local_only"):
        m = GlobalAndLocal(replace(cfg.model, variant=bad))
        with pytest.raises(ValueError, match="fused passes"):
            m.init(jax.random.PRNGKey(0), x, True, sup_count=2)
    m = GlobalAndLocal(cfg.model)
    with pytest.raises(ValueError, match="split the batch"):
        m.init(jax.random.PRNGKey(0), x, True, sup_count=4)
    with pytest.raises(ValueError, match="exclusive"):
        m.init(jax.random.PRNGKey(0), x, True, sup_count=2,
               features_only=True)
