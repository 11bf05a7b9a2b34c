"""Scalar evaluation metrics (reference ``utils/metrics.py``), dependency-free.

Regression metrics for the mPAP-prediction path (``PAHDataset``), the
concordance index the reference intended (its ``C_index`` at
``utils/metrics.py:32`` calls an undefined ``concordance_index`` — fixed
here by implementing it), and the MONAI-style 2-class Dice used as a sanity
metric (``DiceScore :35``). All are jit-friendly jnp math.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(y_true, y_pred) -> jnp.ndarray:
    y_true, y_pred = jnp.asarray(y_true), jnp.asarray(y_pred)
    return jnp.mean((y_true - y_pred) ** 2)


def mae(y_true, y_pred) -> jnp.ndarray:
    y_true, y_pred = jnp.asarray(y_true), jnp.asarray(y_pred)
    return jnp.mean(jnp.abs(y_true - y_pred))


def rmse(y_true, y_pred) -> jnp.ndarray:
    return jnp.sqrt(mse(y_true, y_pred))


def r2(y_true, y_pred) -> jnp.ndarray:
    """Coefficient of determination (sklearn r2_score semantics, including
    the constant-target edge: ss_tot == 0 → 1.0 if ss_res == 0 else 0.0,
    never inf/nan)."""
    y_true, y_pred = jnp.asarray(y_true), jnp.asarray(y_pred)
    ss_res = jnp.sum((y_true - y_pred) ** 2)
    ss_tot = jnp.sum((y_true - jnp.mean(y_true)) ** 2)
    plain = 1.0 - ss_res / jnp.where(ss_tot == 0, 1.0, ss_tot)
    degenerate = jnp.where(ss_res == 0, 1.0, 0.0)
    return jnp.where(ss_tot == 0, degenerate, plain)


def c_index(y_true, y_pred) -> jnp.ndarray:
    """Concordance index × 100 (the reference's broken C_index, by intent).

    Fraction of comparable pairs (y_true_i != y_true_j) where the prediction
    ordering agrees; ties in prediction count 0.5.
    """
    y_true, y_pred = jnp.asarray(y_true).ravel(), jnp.asarray(y_pred).ravel()
    dt = y_true[:, None] - y_true[None, :]
    dp = y_pred[:, None] - y_pred[None, :]
    comparable = (dt != 0).astype(jnp.float32)
    agree = (jnp.sign(dt) == jnp.sign(dp)).astype(jnp.float32)
    tied = (dp == 0).astype(jnp.float32)
    num = jnp.sum(comparable * (agree * (1 - tied) + 0.5 * tied))
    den = jnp.sum(comparable)
    return num / jnp.maximum(den, 1.0) * 100.0


def dice_score_binary(y_true, y_pred_logits) -> jnp.ndarray:
    """MONAI-style mean 2-class Dice (reference DiceScore, utils/metrics.py:35).

    y_true: (B, 1, ...) integer labels {0,1}; y_pred_logits: (B, 2, ...)
    two-channel scores (argmax → one-hot, include_background=True, mean over
    batch and both channels).
    """
    y_true = jnp.asarray(y_true)
    pred_cls = jnp.argmax(jnp.asarray(y_pred_logits), axis=1)  # (B, ...)
    true_cls = y_true[:, 0] if y_true.ndim > pred_cls.ndim else y_true
    dices = []
    for cls in (0, 1):
        p = (pred_cls == cls).astype(jnp.float32)
        t = (true_cls == cls).astype(jnp.float32)
        axes = tuple(range(1, p.ndim))
        inter = jnp.sum(p * t, axis=axes)
        t_sum = jnp.sum(t, axis=axes)
        denom = jnp.sum(p, axis=axes) + t_sum
        # MONAI 1.1.0 DiceMetric default ignore_empty=True: an entry with
        # EMPTY ground truth is NaN (excluded from the mean) even when the
        # prediction fires — not scored 0
        dices.append(jnp.where(t_sum > 0, 2 * inter / jnp.maximum(denom, 1),
                               jnp.nan))
    return jnp.nanmean(jnp.stack(dices))
