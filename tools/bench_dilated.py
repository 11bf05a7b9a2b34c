#!/usr/bin/env python
"""Microbench: dilated 3x3 conv vs its exact space-to-batch phase split.

A dilation-d 3x3 conv on (H, W) taps only pixels of the same (i%d, j%d)
phase, so it equals d^2 independent DENSE 3x3 convs on the (H/d, W/d)
phase grids (batched). On TPU the dense form can map better onto the MXU
for the reference's 28x28 dilated layer3/4 (d=2, d=4). This tool measures
both (and XLA's lowering of the fused backbone stage) to decide whether
the backbone should adopt the rewrite.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from glfusion_tpu.utils.profiling import time_fn


def dilated_conv(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((d, d), (d, d)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def phase_split_conv(x, w, d):
    """Exact space-to-batch rewrite: (B,H,W,C) -> (B*d*d, H/d, W/d, C),
    dense 3x3 with padding 1, then inverse."""
    b, h, w_, c = x.shape
    hp, wp = h // d, w_ // d
    y = x.reshape(b, hp, d, wp, d, c)
    y = jnp.transpose(y, (0, 2, 4, 1, 3, 5)).reshape(b * d * d, hp, wp, c)
    y = jax.lax.conv_general_dilated(
        y, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    co = y.shape[-1]
    y = y.reshape(b, d, d, hp, wp, co)
    return jnp.transpose(y, (0, 3, 1, 4, 2, 5)).reshape(b, h, w_, co)


def main() -> int:
    out = {}
    rs = np.random.RandomState(0)
    for tag, (b, hw, cin, cout, d) in {
        "l3_d2": (24, 28, 256, 256, 2),    # layer3 bottleneck conv2
        "l4_d4": (24, 28, 512, 512, 4),    # layer4 bottleneck conv2
        "l4_d4_b120": (120, 28, 512, 512, 4),  # cycle-forward shape
    }.items():
        x = jnp.asarray(rs.randn(b, hw, hw, cin), jnp.bfloat16)
        w = jnp.asarray(rs.randn(3, 3, cin, cout) * 0.01, jnp.bfloat16)
        # correctness first (f32)
        xf, wf = x.astype(jnp.float32), w.astype(jnp.float32)
        ref = jax.jit(lambda a, k: dilated_conv(a, k, d))(xf, wf)
        got = jax.jit(lambda a, k: phase_split_conv(a, k, d))(xf, wf)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        out[f"{tag}_dilated_ms"] = round(
            time_fn(lambda a, k: dilated_conv(a, k, d), x, w,
                    iters=30) * 1e3, 3)
        out[f"{tag}_phase_ms"] = round(
            time_fn(lambda a, k: phase_split_conv(a, k, d), x, w,
                    iters=30) * 1e3, 3)
    print("DILATED " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
