"""Pallas fused IEKD stem: 7×7 s1 conv + train-BN + ReLU + maxpool, one HBM pass.

Why a hand kernel HERE (and almost nowhere else): the stem is a measured
XLA weakness, not a strength (BASELINE.md r2) —

  * under the per-view ``nn.vmap`` the Cin=1 7×7 conv lowers as a
    ``batch_group_count`` grouped conv that is 2.1× slower than the plain
    form (6.1 vs 2.9 ms fwd at the 120-frame shape);
  * the im2col rewrite fixes the isolated op but LOSES in the full train
    step: its (V,B,110,110,49) patches temp adds ~350 MB of HBM under an
    already-pressured graph;
  * train-mode BN makes XLA materialize the (B,110,110,64) conv map and
    re-read it (stats pass + normalize pass), doubling the stage's
    bandwidth; stem+layer1 burn ~49 ms of fwd+bwd per cycle pass at
    ≤10 % of peak.

This kernel family keeps the 110² map in VMEM only: the conv is an
in-VMEM im2col matmul per image (patches never touch HBM), BN statistics
accumulate in the same pass, and the normalize+ReLU+maxpool epilogue
recomputes the conv instead of re-reading it — HBM traffic drops from
~2 full map passes + pooled write to [read x twice + write pooled once]
(the 112²×1 input is ~50× smaller than the 110²×64 map). The backward
is a custom VJP in the same style (two passes for the global BN
reductions, conv recomputed, per-image weight-gradient partials).

Semantics match the flax modules it replaces (models/resnet.py):
  conv: 7×7, stride 1, padding 2, bias (reference models/_utils.py:192)
  BN:   eps 1e-5; batch stats over (B, H', W'); var = E[z²]−E[z]²
        (flax's single-pass form); y = (z−μ)·rsqrt(σ²+eps)·γ + β
  pool: 3×3 stride 2 padding 1.
One intentional deviation: max-pool backward routes gradient to EVERY
position equal to the window max (XLA's SelectAndScatter picks the first).
Ties between distinct positive conv outputs are measure-zero; ties at
zero are killed by the ReLU gradient mask, so training is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_K = 7  # kernel size
_P = 2  # conv padding


def _interpret() -> bool:
    """Pallas interpreter on non-TPU backends (CPU tests)."""
    return jax.default_backend() != "tpu"


def _pool_dims(hc: int) -> int:
    """3×3 s2 p1 output size for an hc-long axis."""
    return (hc + 2 - 3) // 2 + 1


def _conv_image(x2: jnp.ndarray, wr: jnp.ndarray, bias: jnp.ndarray,
                hc: int, wc: int):
    """(H, W) image → (hc·wc, C) conv output in f32, plus the (hc·wc, 49)
    patch matrix (input dtype) for reuse by weight/input gradients."""
    xpad = jnp.pad(x2, ((_P, _P), (_P, _P)))
    cols = [xpad[i:i + hc, j:j + wc]
            for i in range(_K) for j in range(_K)]
    patches = jnp.stack(cols, axis=-1).reshape(hc * wc, _K * _K)
    z = jnp.dot(patches, wr, preferred_element_type=jnp.float32)
    return z + bias.astype(jnp.float32)[None, :], patches


def _maxpool(h: jnp.ndarray, hc: int, wc: int):
    """(hc, wc, C) → (hp, wp, C) 3×3 s2 p1 max pool on values."""
    hp, wp = _pool_dims(hc), _pool_dims(wc)
    neg = jnp.asarray(jnp.finfo(h.dtype).min, h.dtype)
    padded = jnp.pad(h, ((1, 1), (1, 1), (0, 0)), constant_values=neg)
    out = None
    for i in range(3):
        for j in range(3):
            s = jax.lax.slice(padded, (i, j, 0),
                              (i + 2 * hp - 1, j + 2 * wp - 1, h.shape[-1]),
                              (2, 2, 1))
            out = s if out is None else jnp.maximum(out, s)
    return out


def _pool_grad(h: jnp.ndarray, pooled: jnp.ndarray, dy: jnp.ndarray,
               hc: int, wc: int):
    """Route pooled-output gradient back to window maxima (all ties)."""
    hp, wp = _pool_dims(hc), _pool_dims(wc)
    c = h.shape[-1]
    neg = jnp.asarray(jnp.finfo(h.dtype).min, h.dtype)
    padded = jnp.pad(h, ((1, 1), (1, 1), (0, 0)), constant_values=neg)
    dh_pad = jnp.zeros((hc + 2, wc + 2, c), dy.dtype)
    for i in range(3):
        for j in range(3):
            s = jax.lax.slice(padded, (i, j, 0),
                              (i + 2 * hp - 1, j + 2 * wp - 1, c), (2, 2, 1))
            contrib = jnp.where(s == pooled, dy, 0.0)
            # scatter back at stride 2 via dilated pad
            up = jnp.zeros((hp, 2, wp, 2, c), dy.dtype).at[:, 0, :, 0].set(
                contrib).reshape(2 * hp, 2 * wp, c)[:2 * hp - 1, :2 * wp - 1]
            dh_pad = jax.lax.dynamic_update_slice(
                dh_pad,
                jax.lax.dynamic_slice(
                    dh_pad, (i, j, 0), (2 * hp - 1, 2 * wp - 1, c)) + up,
                (i, j, 0))
    return dh_pad[1:1 + hc, 1:1 + wc]


# --------------------------------------------------------------- kernels

def _stats_kernel(x_ref, w_ref, b_ref, sum_ref, sq_ref, *, hc, wc):
    z, _ = _conv_image(x_ref[0], w_ref[:], b_ref[:], hc, wc)
    sum_ref[0, :] = jnp.sum(z, axis=0)
    sq_ref[0, :] = jnp.sum(z * z, axis=0)


def _norm_pool_kernel(x_ref, w_ref, b_ref, a_ref, o_ref, out_ref,
                      *, hc, wc, out_dtype):
    z, _ = _conv_image(x_ref[0], w_ref[:], b_ref[:], hc, wc)
    c = z.shape[-1]
    n = z * a_ref[:][None, :] + o_ref[:][None, :]
    h = jnp.maximum(n, 0.0).reshape(hc, wc, c).astype(out_dtype)
    out_ref[0] = _maxpool(h, hc, wc)


def _bwd1_kernel(x_ref, w_ref, b_ref, a_ref, o_ref, mu_ref, inv_ref, dy_ref,
                 dn_sum_ref, dnx_sum_ref, *, hc, wc):
    """Per-image BN-backward partial sums: Σdn and Σdn·x̂ per channel."""
    z, _ = _conv_image(x_ref[0], w_ref[:], b_ref[:], hc, wc)
    c = z.shape[-1]
    n = z * a_ref[:][None, :] + o_ref[:][None, :]
    h = jnp.maximum(n, 0.0).reshape(hc, wc, c)
    pooled = _maxpool(h, hc, wc)
    dh = _pool_grad(h, pooled, dy_ref[0].astype(jnp.float32), hc, wc)
    dn = jnp.where(n > 0.0, dh.reshape(hc * wc, c), 0.0)
    xhat = (z - mu_ref[:][None, :]) * inv_ref[:][None, :]
    dn_sum_ref[0, :] = jnp.sum(dn, axis=0)
    dnx_sum_ref[0, :] = jnp.sum(dn * xhat, axis=0)


def _bwd2_kernel(x_ref, w_ref, b_ref, a_ref, o_ref, mu_ref, inv_ref,
                 edn_ref, ednx_ref, dy_ref,
                 dw_ref, db_ref, dx_ref, *, hc, wc, h, w, in_dtype):
    """Per-image dW/dbias partials + dx, with dz from the global BN sums."""
    z, patches = _conv_image(x_ref[0], w_ref[:], b_ref[:], hc, wc)
    c = z.shape[-1]
    n = z * a_ref[:][None, :] + o_ref[:][None, :]
    hmap = jnp.maximum(n, 0.0).reshape(hc, wc, c)
    pooled = _maxpool(hmap, hc, wc)
    dh = _pool_grad(hmap, pooled, dy_ref[0].astype(jnp.float32), hc, wc)
    dn = jnp.where(n > 0.0, dh.reshape(hc * wc, c), 0.0)
    xhat = (z - mu_ref[:][None, :]) * inv_ref[:][None, :]
    dz = a_ref[:][None, :] * (dn - edn_ref[:][None, :]
                              - xhat * ednx_ref[:][None, :])
    dw_ref[0] = jnp.dot(patches.astype(jnp.float32).T, dz,
                        preferred_element_type=jnp.float32)
    db_ref[0, :] = jnp.sum(dz, axis=0)
    # dx: scatter dz·Kᵀ back over the 49 taps
    dck = jnp.dot(dz, w_ref[:].astype(jnp.float32).T,
                  preferred_element_type=jnp.float32).reshape(hc, wc, _K * _K)
    dxp = jnp.zeros((h + 2 * _P, w + 2 * _P), jnp.float32)
    for i in range(_K):
        for j in range(_K):
            dxp = jax.lax.dynamic_update_slice(
                dxp,
                jax.lax.dynamic_slice(dxp, (i, j), (hc, wc))
                + dck[:, :, i * _K + j],
                (i, j))
    dx_ref[0] = dxp[_P:_P + h, _P:_P + w].astype(in_dtype)


# ------------------------------------------------------------ entry points

def _spec_img(h, w):
    return pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _spec_vec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _spec_row(c):
    return pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _batch_stats(x2, wr, bias):
    """(B,H,W) images → per-channel batch mean and E[z²] of the conv (f32)."""
    b, h, w = x2.shape
    hc, wc = h - 2, w - 2
    c = wr.shape[-1]
    sums, sqs = pl.pallas_call(
        functools.partial(_stats_kernel, hc=hc, wc=wc),
        grid=(b,),
        in_specs=[_spec_img(h, w), _spec_vec(), _spec_vec()],
        out_specs=(_spec_row(c), _spec_row(c)),
        out_shape=(jax.ShapeDtypeStruct((b, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, c), jnp.float32)),
        interpret=_interpret(),
    )(x2, wr, bias)
    n = b * hc * wc
    mean = jnp.sum(sums, axis=0) / n
    mean2 = jnp.sum(sqs, axis=0) / n
    return mean, mean2


def _norm_pool(x2, wr, bias, a, o, out_dtype):
    b, h, w = x2.shape
    hc, wc = h - 2, w - 2
    hp, wp = _pool_dims(hc), _pool_dims(wc)
    c = wr.shape[-1]
    return pl.pallas_call(
        functools.partial(_norm_pool_kernel, hc=hc, wc=wc,
                          out_dtype=out_dtype),
        grid=(b,),
        in_specs=[_spec_img(h, w)] + [_spec_vec()] * 4,
        out_specs=pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), out_dtype),
        interpret=_interpret(),
    )(x2, wr, bias, a, o)


@jax.custom_vjp
def fused_stem_train(x, kernel, bias, gamma, beta):
    """Training-mode fused stem.

    x: (B, H, W, 1); kernel: (7, 7, 1, C); bias/gamma/beta: (C,).
    Returns (pooled (B, hp, wp, C) in x.dtype, batch_mean, batch_var) —
    the caller updates BN running stats from the batch moments.
    """
    out, mu, var, _ = _train_fwd_impl(x, kernel, bias, gamma, beta)
    return out, mu, var


def _train_fwd_impl(x, kernel, bias, gamma, beta):
    c = kernel.shape[-1]
    x2 = x[..., 0]
    wr = kernel.reshape(_K * _K, c).astype(x.dtype)
    mu, mean2 = _batch_stats(x2, wr, bias)
    var = mean2 - mu * mu
    inv = jax.lax.rsqrt(var + _EPS)
    a = gamma.astype(jnp.float32) * inv
    o = beta.astype(jnp.float32) - mu * a
    out = _norm_pool(x2, wr, bias, a, o, x.dtype)
    return out, mu, var, (inv, a, o)


def _train_fwd(x, kernel, bias, gamma, beta):
    out, mu, var, (inv, a, o) = _train_fwd_impl(x, kernel, bias, gamma, beta)
    return (out, mu, var), (x, kernel, bias, gamma, beta, mu, inv, a, o)


def _train_bwd(res, cts):
    # cotangents for (out, batch_mean, batch_var): the stat outputs feed
    # only the (stop-gradient) running-average update, so their cotangents
    # are zero; the in-graph dependence of the normalization on μ/σ² is
    # differentiated exactly below (standard train-BN backward).
    dy, _, _ = cts
    x, kernel, bias, gamma, beta, mu, inv, a, o = res
    b, h, w, _ = x.shape
    hc, wc = h - 2, w - 2
    c = kernel.shape[-1]
    x2 = x[..., 0]
    wr = kernel.reshape(_K * _K, c).astype(x.dtype)
    n_total = b * hc * wc

    dn_s, dnx_s = pl.pallas_call(
        functools.partial(_bwd1_kernel, hc=hc, wc=wc),
        grid=(b,),
        in_specs=([_spec_img(h, w)] + [_spec_vec()] * 6
                  + [pl.BlockSpec(
                      (1,) + dy.shape[1:], lambda i: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)]),
        out_specs=(_spec_row(c), _spec_row(c)),
        out_shape=(jax.ShapeDtypeStruct((b, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, c), jnp.float32)),
        interpret=_interpret(),
    )(x2, wr, bias, a, o, mu, inv, dy)
    dgamma = jnp.sum(dnx_s, axis=0)
    dbeta = jnp.sum(dn_s, axis=0)
    edn = dbeta / n_total
    ednx = dgamma / n_total

    dw_p, db_p, dx2 = pl.pallas_call(
        functools.partial(_bwd2_kernel, hc=hc, wc=wc, h=h, w=w,
                          in_dtype=x.dtype),
        grid=(b,),
        in_specs=([_spec_img(h, w)] + [_spec_vec()] * 8
                  + [pl.BlockSpec(
                      (1,) + dy.shape[1:], lambda i: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)]),
        out_specs=(pl.BlockSpec((1, _K * _K, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   _spec_row(c),
                   _spec_img(h, w)),
        out_shape=(jax.ShapeDtypeStruct((b, _K * _K, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, w), x.dtype)),
        interpret=_interpret(),
    )(x2, wr, bias, a, o, mu, inv, edn, ednx, dy)

    dkernel = jnp.sum(dw_p, axis=0).reshape(_K, _K, 1, c).astype(kernel.dtype)
    dbias = jnp.sum(db_p, axis=0).astype(bias.dtype)
    return (dx2[..., None], dkernel, dbias,
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))


fused_stem_train.defvjp(_train_fwd, _train_bwd)


def fused_stem_eval(x, kernel, bias, gamma, beta, ra_mean, ra_var):
    """Eval-mode fused stem (running statistics; no stat outputs)."""
    c = kernel.shape[-1]
    x2 = x[..., 0]
    wr = kernel.reshape(_K * _K, c).astype(x.dtype)
    inv = jax.lax.rsqrt(ra_var.astype(jnp.float32) + _EPS)
    a = gamma.astype(jnp.float32) * inv
    o = beta.astype(jnp.float32) - ra_mean.astype(jnp.float32) * a
    return _norm_pool(x2, wr, bias, a, o, x.dtype)


def reference_stem(x, kernel, bias, gamma, beta, mean, var):
    """Plain-jnp stem with EXPLICIT stats (for parity tests): conv + affine
    BN + ReLU + 3×3 s2 p1 maxpool, same math as the kernels."""
    z = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.astype(jnp.float32), (1, 1),
        ((_P, _P), (_P, _P)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z = z + bias.astype(jnp.float32)
    inv = jax.lax.rsqrt(var + _EPS)
    n = (z - mean) * inv * gamma + beta
    h = jnp.maximum(n, 0.0)
    from glfusion_tpu.ops.pooling import max_pool_3x3_s2
    return max_pool_3x3_s2(h)
