"""Spatial crops with MONAI-compatible semantics, static output shapes.

Reference transform stack (``datasets/loader.py:491-509``):
  train: ``RandSpatialCropd(random_size=False)`` — uniform random window;
  eval:  ``CenterSpatialCropd``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def center_crop(x: jnp.ndarray, crop_hw: tuple[int, int],
                h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """Center crop on (..., H, W, C) — MONAI CenterSpatialCrop start rule."""
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
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
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    ch, cw = crop_hw
    kh, kw = jax.random.split(rng)
    sh = jax.random.randint(kh, (), 0, x.shape[h_axis] - ch + 1)
    sw = jax.random.randint(kw, (), 0, x.shape[w_axis] - cw + 1)
    starts = [0] * x.ndim
    sizes = list(x.shape)
    starts[h_axis], sizes[h_axis] = sh, ch
    starts[w_axis], sizes[w_axis] = sw, cw
    return jax.lax.dynamic_slice(x, starts, sizes)
