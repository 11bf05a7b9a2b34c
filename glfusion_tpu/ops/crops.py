"""Spatial crops with MONAI-compatible semantics, static output shapes.

Reference transform stack (``datasets/loader.py:491-509``):
  train: ``RandSpatialCropd(random_size=False)`` — uniform random window;
  eval:  ``CenterSpatialCropd``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _check_crop(x: jnp.ndarray, crop_hw: tuple[int, int],
                h_axis: int, w_axis: int) -> tuple[int, int]:
    """Validate layout and fit; returns normalized (h_axis, w_axis).

    A crop larger than the input would otherwise slice with a NEGATIVE
    start (Python wraparound → a wrong-shaped remnant, failing far
    downstream) or feed randint an empty range; ndim < 3 would silently
    swap the default -3/-2 axes (see ops/resize.py). The reference never
    hits either: it resizes to 144² before the 112² crop."""
    if x.ndim < 3:
        raise ValueError(
            f"crop needs ndim >= 3 (got {x.ndim}); add a channel axis "
            f"(x[..., None]) or pass explicit h_axis/w_axis")
    h_axis, w_axis = h_axis % x.ndim, w_axis % x.ndim
    ch, cw = crop_hw
    if x.shape[h_axis] < ch or x.shape[w_axis] < cw:
        raise ValueError(
            f"crop {crop_hw} exceeds input "
            f"{(x.shape[h_axis], x.shape[w_axis])}; resize first")
    return h_axis, w_axis


def center_crop(x: jnp.ndarray, crop_hw: tuple[int, int],
                h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """Center crop on (..., H, W, C) — MONAI CenterSpatialCrop start rule."""
    h_axis, w_axis = _check_crop(x, crop_hw, h_axis, w_axis)
    ch, cw = crop_hw
    # MONAI center: start = floor(in/2) - floor(crop/2)
    sh = x.shape[h_axis] // 2 - ch // 2
    sw = x.shape[w_axis] // 2 - cw // 2
    idx = [slice(None)] * x.ndim
    idx[h_axis] = slice(sh, sh + ch)
    idx[w_axis] = slice(sw, sw + cw)
    return x[tuple(idx)]


def random_crop(rng: jax.Array, x: jnp.ndarray, crop_hw: tuple[int, int],
                h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """Uniform random crop on (..., H, W, C); jit-friendly (static out shape)."""
    h_axis, w_axis = _check_crop(x, crop_hw, h_axis, w_axis)
    ch, cw = crop_hw
    kh, kw = jax.random.split(rng)
    sh = jax.random.randint(kh, (), 0, x.shape[h_axis] - ch + 1)
    sw = jax.random.randint(kw, (), 0, x.shape[w_axis] - cw + 1)
    starts = [0] * x.ndim
    sizes = list(x.shape)
    starts[h_axis], sizes[h_axis] = sh, ch
    starts[w_axis], sizes[w_axis] = sw, cw
    return jax.lax.dynamic_slice(x, starts, sizes)
