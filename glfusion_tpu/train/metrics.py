"""Segmentation overlap metrics, jit-friendly confusion-matrix accumulators.

Reference ``main.py:800-815`` (``_calculate_overlap_metrics``): binary
prediction = sigmoid(logits) > 0.5; tp/fp/fn/tn over the flattened tensor;
eps = 1e-5. Per-part Dice loops the 5 structure channels (``main.py:537-543``).

On TPU we accumulate the four counts in-graph (they reduce cleanly with
``psum`` over a data mesh) and derive the ratios on host at report time.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

EPS = 1e-5


def confusion_counts(pred_binary: jnp.ndarray, target: jnp.ndarray,
                     axis=None) -> Dict[str, jnp.ndarray]:
    """tp/fp/fn/tn sums; `axis=None` reduces everything (reference flatten)."""
    p = pred_binary.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return {
        "tp": jnp.sum(p * t, axis=axis),
        "fp": jnp.sum(p * (1.0 - t), axis=axis),
        "fn": jnp.sum((1.0 - p) * t, axis=axis),
        "tn": jnp.sum((1.0 - p) * (1.0 - t), axis=axis),
    }


def overlap_metrics(counts: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    tp, fp, fn, tn = counts["tp"], counts["fp"], counts["fn"], counts["tn"]
    return {
        "pixel_acc": (tp + tn) / (tp + tn + fp + fn + EPS),
        "dice": (2 * tp) / (2 * tp + fp + fn + EPS),
        "precision": tp / (tp + fp + EPS),
        "specificity": tn / (tn + fp + EPS),
        "recall": tp / (tp + fn + EPS),
    }


def segmentation_metrics(logits: jnp.ndarray, target: jnp.ndarray,
                         threshold: float = 0.5) -> Dict[str, jnp.ndarray]:
    """sigmoid>threshold binarization + overlap metrics (whole tensor)."""
    pred = (jnp.asarray(logits) > _logit(threshold)).astype(jnp.float32)
    return overlap_metrics(confusion_counts(pred, target))


def per_part_dice(logits: jnp.ndarray, target: jnp.ndarray,
                  class_axis: int = -1, threshold: float = 0.5) -> jnp.ndarray:
    """Dice per structure channel (reference main.py:537-543)."""
    pred = (jnp.asarray(logits) > _logit(threshold)).astype(jnp.float32)
    axes = tuple(i for i in range(logits.ndim) if i != class_axis % logits.ndim)
    c = confusion_counts(pred, target, axis=axes)
    return (2 * c["tp"]) / (2 * c["tp"] + c["fp"] + c["fn"] + EPS)


def _logit(p: float) -> float:
    import math
    return math.log(p / (1.0 - p))
