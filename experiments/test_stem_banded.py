"""Banded-matmul fused stem (ops/stem_banded.py) parity.

The module is the MEASURED CLOSE of the stem-kernel investigation
(BASELINE.md r3): numerically correct (these tests) but slower than XLA's
native conv on TPU, so it is not wired into the model — kept as the
experiment artifact the negative result cites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiments.stem_banded import fused_stem_eval, fused_stem_train
from experiments.stem_pallas import reference_stem


def _params(rs, c):
    return (jnp.asarray(rs.randn(7, 7, 1, c) * 0.1, jnp.float32),
            jnp.asarray(rs.randn(c) * 0.1, jnp.float32),
            jnp.asarray(rs.rand(c) + 0.5, jnp.float32),
            jnp.asarray(rs.randn(c) * 0.1, jnp.float32))


def _ref_stats(x, k, bias):
    z = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    return jnp.mean(z, axis=(0, 1, 2)), jnp.var(z, axis=(0, 1, 2))


@pytest.mark.parametrize("shape", [(2, 28, 28, 8), (2, 21, 19, 16),
                                   (1, 16, 30, 8)])
def test_train_forward_matches_reference(shape):
    b, h, w, c = shape
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, h, w, 1), jnp.float32)
    k, bias, gamma, beta = _params(rs, c)
    out, mu, var = fused_stem_train(x, k, bias, gamma, beta)
    mu_r, var_r = _ref_stats(x, k, bias)
    np.testing.assert_allclose(mu, mu_r, atol=1e-5)
    np.testing.assert_allclose(var, var_r, atol=1e-5)
    ref = reference_stem(x, k, bias, gamma, beta, mu_r, var_r)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_eval_forward_matches_reference():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 24, 24, 1), jnp.float32)
    k, bias, gamma, beta = _params(rs, 8)
    mean = jnp.asarray(rs.randn(8) * 0.1, jnp.float32)
    var = jnp.asarray(rs.rand(8) + 0.5, jnp.float32)
    out = fused_stem_eval(x, k, bias, gamma, beta, mean, var)
    ref = reference_stem(x, k, bias, gamma, beta, mean, var)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_gradients_match_xla_autodiff():
    """The custom-VJP (XLA recompute of the exact train graph) against
    end-to-end autodiff of the plain graph, all five inputs."""
    rs = np.random.RandomState(2)
    b, h, w, c = 2, 20, 20, 8
    x = jnp.asarray(rs.randn(b, h, w, 1), jnp.float32)
    k, bias, gamma, beta = _params(rs, c)

    def loss_fused(x, k, bias, gamma, beta):
        out, _, _ = fused_stem_train(x, k, bias, gamma, beta)
        return jnp.sum(out ** 2)

    def loss_ref(x, k, bias, gamma, beta):
        mu, var = _ref_stats(x, k, bias)
        z = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        n = (z - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        from glfusion_tpu.ops.pooling import max_pool_3x3_s2
        return jnp.sum(max_pool_3x3_s2(jnp.maximum(n, 0.0)) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, k, bias, gamma,
                                                       beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, k, bias, gamma, beta)
    for a, b_, name in zip(gf, gr, ("x", "k", "bias", "gamma", "beta")):
        scale = max(float(jnp.max(jnp.abs(b_))), 1.0)
        np.testing.assert_allclose(a, b_, atol=2e-3 * scale, err_msg=name)


def test_vmap_per_view_matches_loop():
    """Under the per-view vmap (the flagship's usage pattern) each view's
    output equals the unbatched call — the banded-weight scratch rebuild
    must fire per view."""
    rs = np.random.RandomState(3)
    v, b, h, w, c = 3, 2, 18, 18, 8
    xv = jnp.asarray(rs.randn(v, b, h, w, 1), jnp.float32)
    parts = [_params(rs, c) for _ in range(v)]
    stacked = tuple(jnp.stack([p[i] for p in parts]) for i in range(4))
    ov, muv, varv = jax.vmap(fused_stem_train)(xv, *stacked)
    for vi in range(v):
        o1, m1, v1 = fused_stem_train(xv[vi], *parts[vi])
        np.testing.assert_allclose(ov[vi], o1, atol=1e-5)
        np.testing.assert_allclose(muv[vi], m1, atol=1e-6)
        np.testing.assert_allclose(varv[vi], v1, atol=1e-6)
