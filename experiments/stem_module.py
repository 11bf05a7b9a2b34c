"""Flax wrapper for the fused Pallas stem — the in-model A/B harness.

``FusedIEKDStem`` exposes the fused kernel behind a param/batch_stats tree
IDENTICAL to ``glfusion_tpu.models.resnet.IEKDStem`` ('stem_conv'
{kernel,bias}, 'stem_bn'{scale,bias} + batch_stats 'stem_bn'{mean,var}),
so the two modules are interchangeable under one variable dict — that is
how the kernel was A/B-measured inside the real model before the book
closed negative (BASELINE.md "stem kernel book"). Formerly the
``stem_pallas`` branch of ``ResNetIEKD`` (removed round 4).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from experiments.stem_pallas import fused_stem_eval, fused_stem_train
from glfusion_tpu.models.resnet import _BN


class FusedIEKDStem(nn.Module):
    """conv 7×7 s1 p2 (+bias) → train/eval BN → ReLU → maxpool 3×3 s2,
    one fused HBM pass (contract of models/resnet.IEKDStem)."""

    stem_width: int = 64
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dtype = jnp.dtype(self.dtype)
        cin = x.shape[-1]
        sc = self.scope.push("stem_conv")
        kernel = sc.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, cin, self.stem_width))
        bias = sc.param("bias", nn.initializers.zeros, (self.stem_width,))
        sb = self.scope.push("stem_bn")
        scale = sb.param("scale", nn.initializers.ones, (self.stem_width,))
        bn_bias = sb.param("bias", nn.initializers.zeros, (self.stem_width,))
        ra_mean = sb.variable("batch_stats", "mean",
                              lambda s: jnp.zeros(s, jnp.float32),
                              (self.stem_width,))
        ra_var = sb.variable("batch_stats", "var",
                             lambda s: jnp.ones(s, jnp.float32),
                             (self.stem_width,))
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        if train:
            out, mu, var = fused_stem_train(x, kernel, bias, scale, bn_bias)
            if not self.is_initializing():
                m = _BN["momentum"]
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mu
                ra_var.value = m * ra_var.value + (1.0 - m) * var
            return out
        return fused_stem_eval(x, kernel, bias, scale, bn_bias,
                               ra_mean.value, ra_var.value)
