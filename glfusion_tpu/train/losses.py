"""Losses: sum-reduction BCE-with-logits and the temporal cycle-consistency loss.

Reference: ``main.py:87`` (``BCEWithLogitsLoss(reduction='sum')``),
``main.py:650-717`` (``seg_cycle``), ``main.py:719-798`` (``dense_seg_cycle``).
All shapes are static; the single random chunk start of ``seg_cycle`` is
drawn in-graph from a PRNG key (replacing ``np.random.choice``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bce_with_logits_sum(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sum-reduced binary cross entropy with logits."""
    # max(x,0) - x*t + log1p(exp(-|x|)) — identical to torch's stable form.
    x, t = logits, targets
    per_elem = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.sum(per_elem)


def _bce_mean(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    x, t = logits, targets
    per_elem = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per_elem)


def _cycle_from_start(feat: jnp.ndarray, start_onehot: jnp.ndarray,
                      target_region: int, cyc_off: int, chunk: int,
                      temperature: float,
                      bce_target: jnp.ndarray | None = None) -> jnp.ndarray:
    """Cycle-consistency BCE for one chunk start.

    feat: (T, D) per-frame pooled features; start_onehot: (S,) HARD one-hot
    with S = target_region - (chunk + cyc_off) + 1, used to select the
    query window (soft select keeps static shapes). ``bce_target`` (default
    = start_onehot) is the BCE label only — the reference's soft label
    (main.py:792-794) changes the TARGET after computing similarities from
    the hard start, never the window selection. Mirrors the gather/soft-NN
    math of reference ``main.py:650-717`` with static shapes.
    """
    t_total, d = feat.shape
    query = feat[:target_region]                      # (R, D)
    query_cyc = feat[cyc_off:target_region]           # (R - off, D)
    key = feat[target_region:]                        # (K, D)
    k = t_total - target_region
    s = target_region - (chunk + cyc_off) + 1

    # query chunk selected by the one-hot (soft select keeps static shapes):
    # query_feat[c] = Σ_s onehot[s] · query[s + c]
    win_idx = jnp.arange(s)[:, None] + jnp.arange(chunk)[None, :]  # (S, chunk)
    query_windows = query[win_idx]                    # (S, chunk, D)
    query_feat = jnp.einsum("s,scd->cd", start_onehot, query_windows)

    # dist[k_, c] = ||key[k_] - query_feat[c]||²
    dist = jnp.sum((key[:, None, :] - query_feat[None, :, :]) ** 2, axis=-1)
    # shifted diagonal windows: dist_shft[k_, c] = dist[(k_ + c) % K, c]
    rows = (jnp.arange(k)[:, None] + jnp.arange(chunk)[None, :]) % k
    dist_shft = jnp.take_along_axis(dist, rows, axis=0)
    window = dist_shft[: k - (chunk + cyc_off) + 1]   # (K', chunk)
    sim = -jnp.sum(window, axis=1)                    # (K',)
    beta = jax.nn.softmax(sim / d / chunk * temperature)

    # weighted key windows, shifted by cyc_off:
    # weighted[c] = Σ_k beta[k] * key[(k + cyc_off + c) % K]
    idx = (jnp.arange(k)[:, None] + cyc_off + jnp.arange(chunk)[None, :]) % k
    key_windows = key[idx][: k - (chunk + cyc_off) + 1]   # (K', chunk, D)
    weighted = jnp.einsum("k,kcd->cd", beta, key_windows)  # (chunk, D)

    # cycle back against query windows
    q = target_region - cyc_off
    qdist = jnp.sum((query_cyc[:, None, :] - weighted[None, :, :]) ** 2,
                    axis=-1)                          # (q, chunk)
    qrows = (jnp.arange(q)[:, None] + jnp.arange(chunk)[None, :]) % q
    qdist_shft = jnp.take_along_axis(qdist, qrows, axis=0)
    qwindow = qdist_shft[: q - chunk + 1]             # (S, chunk)
    q_sim = -jnp.sum(qwindow, axis=1) / d / chunk * temperature  # (S,)

    target = start_onehot if bce_target is None else bce_target
    return _bce_mean(q_sim, target)


@functools.partial(jax.jit, static_argnames=(
    "target_region", "cyc_off", "chunk", "temperature"))
def seg_cycle_loss(rng: jax.Array, feat: jnp.ndarray, *,
                   target_region: int = 16, cyc_off: int = 2, chunk: int = 3,
                   temperature: float = 10.0) -> jnp.ndarray:
    """Sampled-start cycle loss (reference ``seg_cycle``, main.py:650-717)."""
    s = target_region - (chunk + cyc_off) + 1
    start = jax.random.randint(rng, (), 0, s)
    onehot = jax.nn.one_hot(start, s)
    return _cycle_from_start(feat, onehot, target_region, cyc_off, chunk,
                             temperature)


@functools.partial(jax.jit, static_argnames=(
    "target_region", "cyc_off", "chunk", "temperature", "soft_label",
    "is_overlap"))
def dense_seg_cycle_loss(feat: jnp.ndarray, *, target_region: int = 16,
                         cyc_off: int = 2, chunk: int = 3,
                         temperature: float = 10.0, soft_label: bool = False,
                         is_overlap: bool = True) -> jnp.ndarray:
    """All-starts cycle loss (reference ``dense_seg_cycle``, main.py:719-798)."""
    s = target_region - (chunk + cyc_off) + 1
    step = 1 if is_overlap else chunk
    starts = jnp.arange(0, s, step)
    onehots = jax.nn.one_hot(starts, s)
    # soft label softens only the BCE TARGET (reference main.py:792-794);
    # the query-window selection stays hard
    targets = onehots
    if soft_label:
        targets = jnp.where(onehots == 1.0, 0.8, 0.2 / max(s - 1, 1))
    losses = jax.vmap(lambda oh, tgt: _cycle_from_start(
        feat, oh, target_region, cyc_off, chunk, temperature,
        bce_target=tgt))(onehots, targets)
    # reference divides the summed loss by S regardless of step (main.py:798)
    return jnp.sum(losses) / s
