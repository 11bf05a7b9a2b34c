"""Loss numerics: BCE-sum vs torch; cycle loss vs an independent NumPy model.

The NumPy oracle below follows the soft-nearest-neighbor cycle description
(SURVEY.md §3.5) with plain loops — written independently from both the
reference tensor code and the JAX implementation.
"""

import jax
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


def _numpy_cycle_oracle(feat, start, region, off, chunk, temp):
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


def test_cycle_loss_differentiable():
    feat = jax.random.normal(jax.random.PRNGKey(4), (20, 6))
    g = jax.grad(lambda f: dense_seg_cycle_loss(
        f, target_region=8, cyc_off=2, chunk=3, temperature=10.0))(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
