"""Resize ops with PyTorch-compatible semantics, jit/XLA friendly.

The reference resizes with MONAI ``Resized(mode='nearest')`` (torch
``F.interpolate(mode='nearest')``; reference ``datasets/loader.py:491-509``)
and upsamples logits with ``F.interpolate(mode='bilinear',
align_corners=False)`` (reference ``models/ours.py:1838``). Dice parity
requires matching both index rules exactly:

  * nearest: ``src = floor(dst * in / out)``
  * bilinear align_corners=False: half-pixel centers — identical to
    ``jax.image.resize(method='linear')``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _nearest_indices_np(out_size: int, in_size: int) -> np.ndarray:
    # torch nearest rule: src = floor(i * scale) with scale = in/out computed
    # in FLOAT32 (torch's CPU/CUDA kernels use single precision here; e.g.
    # 90 * (200/144) → 124.9999 → 124, not the exact 125). Bit-parity with
    # MONAI Resized(mode='nearest') requires reproducing that rounding.
    # PLAIN numpy: host loaders use this table directly — wrapping it in a
    # device array would make every host-side resize a device round trip
    # (seconds each through remote TPU transports).
    scale = np.float32(in_size) / np.float32(out_size)
    idx = np.floor(np.arange(out_size, dtype=np.float32) * scale)
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


def _nearest_indices(out_size: int, in_size: int) -> jnp.ndarray:
    return jnp.asarray(_nearest_indices_np(out_size, in_size))


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int],
                   h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """Nearest-neighbor spatial resize (torch ``interpolate(mode='nearest')``).

    Default layout is NHWC-style (..., H, W, C); pass axes for others.
    """
    if x.ndim < 3:
        # the default -3/-2 axes would silently SWAP H/W on a 2-D input
        # ((-3) % 2 == 1, (-2) % 2 == 0); demand an explicit channel axis
        raise ValueError(
            f"resize_nearest needs ndim >= 3 (got {x.ndim}); add a channel "
            f"axis (x[..., None]) or pass explicit h_axis/w_axis")
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    out_h, out_w = out_hw
    hi = _nearest_indices(out_h, x.shape[h_axis])
    wi = _nearest_indices(out_w, x.shape[w_axis])
    x = jnp.take(x, hi, axis=h_axis)
    x = jnp.take(x, wi, axis=w_axis)
    return x


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=False semantics on (..., H, W, C).

    ``antialias=False`` explicitly: jax defaults to True, which widens the
    kernel on DOWNSAMPLING and would diverge from torch
    ``F.interpolate(mode='bilinear')`` (fixed 2-tap kernel). Upsampling —
    every current call site — is identical either way.
    """
    out_shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, out_shape, method="linear", antialias=False)


def _linear_weights_ac(out_size: int, in_size: int):
    """align_corners=True gather indices + lerp weights (static, host-side)."""
    if out_size == 1 or in_size == 1:
        lo = np.zeros(out_size, np.int64)
        return lo, lo, np.zeros(out_size, np.float32)
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    w = (src - lo).astype(np.float32)
    return lo, hi, w


def resize_bilinear_ac(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear with align_corners=True (torch ``align_corners=True``),
    on (..., H, W, C) — used by the UTNet attention projections
    (reference ``models/conv_trans_utils.py:190``)."""
    out_h, out_w = out_hw
    h_lo, h_hi, h_w = _linear_weights_ac(out_h, x.shape[-3])
    w_lo, w_hi, w_w = _linear_weights_ac(out_w, x.shape[-2])
    hw = jnp.asarray(h_w)[:, None, None]
    ww = jnp.asarray(w_w)[:, None]
    top = jnp.take(x, jnp.asarray(h_lo), axis=-3)
    bot = jnp.take(x, jnp.asarray(h_hi), axis=-3)
    x = top * (1 - hw) + bot * hw
    left = jnp.take(x, jnp.asarray(w_lo), axis=-2)
    right = jnp.take(x, jnp.asarray(w_hi), axis=-2)
    return left * (1 - ww) + right * ww
