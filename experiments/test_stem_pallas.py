"""Pallas fused stem kernel parity (experiments/stem_pallas.py).

Runs the kernels in interpreter mode on CPU; the TPU-compiled path is
exercised by bench/profile runs (BASELINE.md records measured deltas).
Run with ``python -m pytest experiments/ -q`` — excluded from the main
suite (closed-negative research, experiments/README.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiments.stem_pallas import (
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


def test_fused_module_same_tree_and_outputs_as_flax_stem():
    """The fused module changes the compute path, NOT the checkpoint
    contract: identical param/batch_stats trees (paths, shapes, init
    values) as models/resnet.IEKDStem, identical eval output for the same
    params, and matching train-mode BN running-stat updates."""
    from flax.traverse_util import flatten_dict

    from experiments.stem_module import FusedIEKDStem
    from glfusion_tpu.models.resnet import IEKDStem

    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1), jnp.float32)
    plain = IEKDStem(stem_width=4)
    fused = FusedIEKDStem(stem_width=4)
    vp = plain.init(jax.random.PRNGKey(5), x, False)
    vf = fused.init(jax.random.PRNGKey(5), x, False)
    fp = flatten_dict(vp["params"])
    ff = flatten_dict(vf["params"])
    assert set(fp) == set(ff)
    for k in fp:
        np.testing.assert_array_equal(np.asarray(fp[k]), np.asarray(ff[k]),
                                      err_msg=str(k))
    assert (set(flatten_dict(vp["batch_stats"]))
            == set(flatten_dict(vf["batch_stats"])))

    out_p = plain.apply(vp, x, False)
    out_f = fused.apply(vp, x, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=1e-4, rtol=1e-4)

    _, up_p = plain.apply(vp, x, True, mutable=["batch_stats"])
    _, up_f = fused.apply(vp, x, True, mutable=["batch_stats"])
    sp = flatten_dict(up_p["batch_stats"])
    sf = flatten_dict(up_f["batch_stats"])
    assert set(sp) == set(sf)
    for k in sp:
        np.testing.assert_allclose(np.asarray(sp[k]), np.asarray(sf[k]),
                                   atol=1e-5, rtol=1e-4, err_msg=str(k))


def test_fused_module_under_vmap_differentiates():
    """The fused stem composes with the per-view nn.vmap lift and reverse
    AD (pallas batching + custom_vjp batching) — the lift the real model
    applies — and matches the flax stem's value and gradients."""
    from glfusion_tpu.models.glfusion import _per_view
    from glfusion_tpu.models.resnet import IEKDStem

    from experiments.stem_module import FusedIEKDStem

    x = jnp.asarray(np.random.RandomState(0).rand(3, 2, 16, 16, 1),
                    jnp.float32)

    def run(cls):
        mod = _per_view(cls)(stem_width=4, name="stem")
        variables = mod.init(jax.random.PRNGKey(7), x, False)

        def loss(p):
            y, upd = mod.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x, True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2)

        val, g = jax.value_and_grad(loss)(variables["params"])
        return val, g

    val_p, g_p = run(IEKDStem)
    val_f, g_f = run(FusedIEKDStem)
    np.testing.assert_allclose(float(val_f), float(val_p),
                               atol=1e-3, rtol=1e-4)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    assert len(flat_p) == len(flat_f) > 0
    for path, leaf in flat_p:
        # atol covers the conv-bias grad, which train-BN cancels to ~0
        # mathematically — both paths report reassociation noise there
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_f[path]),
                                   atol=5e-3, rtol=2e-3, err_msg=str(path))
