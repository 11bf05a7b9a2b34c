"""Pallas fused stem kernel parity (ops/stem_pallas.py).

Runs the kernels in interpreter mode on CPU; the TPU-compiled path is
exercised by bench/profile runs (BASELINE.md records measured deltas).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glfusion_tpu.ops.stem_pallas import (
    _EPS,
    fused_stem_eval,
    fused_stem_train,
)
from glfusion_tpu.ops.pooling import max_pool_3x3_s2


def _plain_train_stem(x, kernel, bias, gamma, beta):
    """Differentiable plain-jnp reference: conv → train BN (flax stats
    form) → ReLU → maxpool."""
    z = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.astype(jnp.float32), (1, 1),
        ((2, 2), (2, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z = z + bias
    mu = z.mean(axis=(0, 1, 2))
    var = (z * z).mean(axis=(0, 1, 2)) - mu * mu
    n = (z - mu) * jax.lax.rsqrt(var + _EPS) * gamma + beta
    return max_pool_3x3_s2(jnp.maximum(n, 0.0)), mu, var


def _make_inputs(b=3, h=20, w=20, c=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (b, h, w, 1))
    kernel = jax.random.normal(ks[1], (7, 7, 1, c)) * 0.3
    bias = jax.random.normal(ks[2], (c,)) * 0.1
    gamma = 1.0 + 0.2 * jax.random.normal(ks[3], (c,))
    beta = 0.1 * jax.random.normal(ks[4], (c,))
    return x, kernel, bias, gamma, beta


def test_fused_train_forward_matches_plain():
    args = _make_inputs()
    out, mu, var = fused_stem_train(*args)
    ref, rmu, rvar = _plain_train_stem(*args)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(mu), np.asarray(rmu),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(rvar),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_train_backward_matches_plain():
    """Full custom-VJP parity incl. differentiation THROUGH the batch
    statistics (the train-BN backward) and maxpool routing."""
    args = _make_inputs(seed=3)
    gw = jax.random.normal(jax.random.PRNGKey(9),
                           fused_stem_train(*args)[0].shape)

    def loss_fused(*a):
        out, _, _ = fused_stem_train(*a)
        return jnp.sum(out.astype(jnp.float32) * gw)

    def loss_plain(*a):
        out, _, _ = _plain_train_stem(*a)
        return jnp.sum(out * gw)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_plain = jax.grad(loss_plain, argnums=(0, 1, 2, 3, 4))(*args)
    for name, gf, gp in zip(("x", "kernel", "bias", "gamma", "beta"),
                            g_fused, g_plain):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gp),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_fused_eval_matches_plain():
    x, kernel, bias, gamma, beta = _make_inputs(seed=5)
    ra_mean = 0.3 * jnp.ones((kernel.shape[-1],), jnp.float32)
    ra_var = 1.7 * jnp.ones((kernel.shape[-1],), jnp.float32)
    out = fused_stem_eval(x, kernel, bias, gamma, beta, ra_mean, ra_var)
    z = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    n = (z - ra_mean) * jax.lax.rsqrt(ra_var + _EPS) * gamma + beta
    ref = max_pool_3x3_s2(jnp.maximum(n, 0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_resnet_stem_pallas_same_tree_and_eval_output():
    """The flag changes the compute path, NOT the checkpoint contract:
    identical param/batch_stats trees (paths, shapes, init values) and
    identical eval output for the same params."""
    from flax.traverse_util import flatten_dict

    from glfusion_tpu.models.resnet import ResNetIEKD

    kw = dict(stem_width=4, block_sizes=(1, 1, 1, 1), widths=(2, 4, 6, 8))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1), jnp.float32)
    plain = ResNetIEKD(**kw)
    fused = ResNetIEKD(**kw, stem_pallas=True)
    vp = plain.init(jax.random.PRNGKey(5), x, False)
    vf = fused.init(jax.random.PRNGKey(5), x, False)
    fp = flatten_dict(vp["params"])
    ff = flatten_dict(vf["params"])
    assert set(fp) == set(ff)
    for k in fp:
        np.testing.assert_array_equal(np.asarray(fp[k]), np.asarray(ff[k]),
                                      err_msg=str(k))
    sp = flatten_dict(vp["batch_stats"])
    sf = flatten_dict(vf["batch_stats"])
    assert set(sp) == set(sf)

    out_p = plain.apply(vp, x, False)
    out_f = fused.apply(vp, x, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=1e-4, rtol=1e-4)


def test_resnet_stem_pallas_train_stats_match():
    """Train-mode BN running-stat updates equal the flax path's."""
    from flax.traverse_util import flatten_dict

    from glfusion_tpu.models.resnet import ResNetIEKD

    kw = dict(stem_width=4, block_sizes=(1, 1, 1, 1), widths=(2, 4, 6, 8))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 1), jnp.float32)
    plain = ResNetIEKD(**kw)
    fused = ResNetIEKD(**kw, stem_pallas=True)
    v = plain.init(jax.random.PRNGKey(5), x, False)
    _, up_p = plain.apply(v, x, True, mutable=["batch_stats"])
    _, up_f = fused.apply(v, x, True, mutable=["batch_stats"])
    fp = flatten_dict(up_p["batch_stats"])
    ff = flatten_dict(up_f["batch_stats"])
    assert set(fp) == set(ff)
    for k in fp:
        np.testing.assert_allclose(np.asarray(fp[k]), np.asarray(ff[k]),
                                   atol=1e-5, rtol=1e-4, err_msg=str(k))


def test_glfusion_stem_pallas_under_vmap_trains():
    """The fused stem composes with the per-view nn.vmap lift and the full
    train step (pallas batching + custom_vjp batching)."""
    from dataclasses import replace

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    cfg = tiny_config()
    cfg = replace(cfg, model=replace(cfg.model, stem_pallas=True))
    model = GlobalAndLocal(cfg.model)
    ref_model = GlobalAndLocal(replace(cfg.model, stem_pallas=False))
    v_, b, hw = cfg.model.num_views, 2, cfg.data.crop_hw
    t = cfg.data.clip_length
    x = jnp.asarray(np.random.RandomState(0).rand(v_, b, hw, hw, 1),
                    jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, False))(
        jax.random.PRNGKey(0))
    # same params, same eval output as the unfused model
    out_f = model.apply(variables, x, False)["mask"]
    out_p = ref_model.apply(variables, x, False)["mask"]
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=1e-3, rtol=1e-3)

    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, 1))
    batch = {
        "images": x,
        "masks": jnp.asarray(
            np.random.RandomState(1).rand(v_, b, hw, hw, 5) > 0.5,
            jnp.float32),
        "clips": jnp.asarray(
            np.random.RandomState(2).rand(v_, t, hw, hw, 1), jnp.float32),
    }
    _, metrics = make_train_step(cfg, model)(state, batch,
                                             jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
