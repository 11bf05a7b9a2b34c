"""Pooling ops matching torch semantics (floor division on output size)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``MaxPool2d(kernel_size=3, stride=2, padding=1)`` on NHWC.

    Output size = floor((H + 2 - 3) / 2) + 1, pads with -inf so padded
    positions never win — identical to torch for any finite input.
    """
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))
