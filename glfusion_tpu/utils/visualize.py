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


def write_png(path: str | Path, rgba: np.ndarray) -> None:
    """Write an (H, W, 4) uint8 RGBA array as a PNG — stdlib only.

    From-scratch PNG-1.2 encoder (signature + IHDR/IDAT/IEND, filter 0,
    zlib stream). Replaces the reference's matplotlib ``plt.imsave``
    (``main.py:641-645``): the only thing it used matplotlib for was
    PNG encoding, and a 20-line encoder removes a heavyweight optional
    dependency from the serving/visualization path.
    """
    import struct
    import zlib

    arr = np.ascontiguousarray(np.asarray(rgba, dtype=np.uint8))
    if arr.ndim != 3 or arr.shape[2] != 4:
        raise ValueError(f"expected (H, W, 4) RGBA uint8, got {arr.shape}")
    h, w = arr.shape[:2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return (struct.pack(">I", len(payload)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # 8-bit RGBA
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    Path(path).write_bytes(png)


def save_clip_visualization(out_dir: str | Path, method_name: str,
                            patient_id: str, view: str,
                            logits: np.ndarray) -> int:
    """Write per-frame pred_<t>.png files; returns the number of frames.

    Directory layout matches the reference
    (``./visualze_for_ppt/<method>/192_data/<patient>/<view>/``).
    """
    cmap = np.asarray(class_map(jnp.asarray(logits)))
    rgba = colorize(cmap)  # (T, H, W, 4)
    d = Path(out_dir) / method_name / "192_data" / str(patient_id) / str(view)
    d.mkdir(parents=True, exist_ok=True)
    for t in range(rgba.shape[0]):
        write_png(d / f"pred_{t}.png", rgba[t])
    return rgba.shape[0]
