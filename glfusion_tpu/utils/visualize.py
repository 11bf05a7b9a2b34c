"""Prediction visualization (reference ``main.py:546-648`` test_visualize).

Reference behavior: sigmoid>0.5 per channel, argmax over
[0.5-background | 5 class channels], then a fixed class→RGBA color table,
one PNG per frame under ``<out>/<method>/192_data/<patient>/<view>/pred_<t>.png``.

TPU-native: thresholding + argmax happen in-graph; the reference's pure-Python
per-pixel color loop (``main.py:621-634``) becomes a vectorized LUT gather.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

# class id → RGBA, exactly the reference table (main.py:625-634):
# 0 background, then the 5 structure channels in mask order.
COLOR_TABLE = np.array(
    [
        [0, 0, 0, 255],        # 0: background
        [55, 255, 254, 255],   # 1
        [27, 255, 46, 255],    # 2 (ra)
        [45, 0, 251, 255],     # 3 (rv)
        [251, 13, 15, 255],    # 4 (la)
        [223, 48, 236, 255],   # 5 (lv)
    ],
    dtype=np.uint8,
)


def class_map(logits: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) logits → (..., H, W) int class ids, 0 = background.

    Reference main.py:607-612: binarize sigmoid>0.5 per channel, then argmax
    over [0.5 | channels] — i.e. background wins unless some channel fired.
    """
    binary = (jnp.asarray(logits) > 0.0).astype(jnp.float32)  # sigmoid>.5
    bg = jnp.full(binary.shape[:-1] + (1,), 0.5, binary.dtype)
    return jnp.argmax(jnp.concatenate([bg, binary], axis=-1), axis=-1)


def colorize(cls_map: np.ndarray) -> np.ndarray:
    """(..., H, W) int class ids → (..., H, W, 4) uint8 RGBA via LUT gather."""
    return COLOR_TABLE[np.asarray(cls_map)]


def save_clip_visualization(out_dir: str | Path, method_name: str,
                            patient_id: str, view: str,
                            logits: np.ndarray) -> int:
    """Write per-frame pred_<t>.png files; returns the number of frames.

    Directory layout matches the reference
    (``./visualze_for_ppt/<method>/192_data/<patient>/<view>/``).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cmap = np.asarray(class_map(jnp.asarray(logits)))
    rgba = colorize(cmap)  # (T, H, W, 4)
    d = Path(out_dir) / method_name / "192_data" / str(patient_id) / str(view)
    d.mkdir(parents=True, exist_ok=True)
    for t in range(rgba.shape[0]):
        plt.imsave(d / f"pred_{t}.png", rgba[t])
    return rgba.shape[0]
