#!/usr/bin/env python
"""Microbench: lowerings of the ASPP rate-12 dilated 3x3 conv at 28^2.

MEASURED VERDICT: native wins (2.7 ms fwd vs 3.4 clipped / 3.6 im2col /
10.0 patches at the 144-frame shape) — the op-profile row that motivated
this tool (11.4 ms attributed to the classifier's b1_conv) turned out to
be a whole XLA fusion around a healthy 2048->256-channel branch running
at ~47% of peak, not a pathological lowering. The ASPP heuristic
(decompose a dilated branch only when <50% of taps are in-bounds) stands.
At rate 12 on a 28x28 map the effective kernel extent is 25x25 and 49%
of taps read only zero padding; the exact alternatives benchmarked:

  native   - lax.conv_general_dilated (what ASPP emits today at rate 12)
  clipped  - the DilatedConv3x3 tap decomposition (9 in-bounds einsums +
             region accumulation), forced on
  im2col   - zero-pad, stack the 9 rate-shifted slices on the channel axis,
             ONE (tokens, 9C) x (9C, Cout) matmul; autodiff backward
  patches  - same via lax.conv_general_dilated_patches

All validated against native at f32, timed fwd and fwd+bwd in bf16 at the
train-step shape (144 frames = 24 supervised + 120 cycle).
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

B, HW, C, R = 144, 28, 256, 12


def native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((R, R), (R, R)), rhs_dilation=(R, R),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def clipped(x, w):
    from glfusion_tpu.models.aspp import _add_border_taps
    center = jnp.einsum("...c,co->...o", x, w[1, 1],
                        preferred_element_type=jnp.float32)
    return _add_border_taps(x, w, R, center).astype(x.dtype)


def im2col(x, w):
    xp = jnp.pad(x, ((0, 0), (R, R), (R, R), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, i * R:i * R + HW, j * R:j * R + HW, :]
         for i in range(3) for j in range(3)], axis=-1)  # (B,HW,HW,9C)
    return jnp.einsum(
        "bhwk,ko->bhwo", cols,
        w.transpose(0, 1, 2, 3).reshape(9 * C, -1),
        preferred_element_type=jnp.float32).astype(x.dtype)


def patches(x, w):
    cols = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((R, R), (R, R)), rhs_dilation=(R, R),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B,HW,HW,C*9)
    # patches orders channels as (C, 3, 3) fastest-last = spatial-minor
    wk = w.transpose(2, 0, 1, 3).reshape(C * 9, -1)
    return jnp.einsum("bhwk,ko->bhwo", cols, wk,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def main() -> int:
    rs = np.random.RandomState(0)
    xf = jnp.asarray(rs.randn(B, HW, HW, C), jnp.float32)
    wf = jnp.asarray(rs.randn(3, 3, C, C) * 0.02, jnp.float32)
    ref = np.asarray(jax.jit(native)(xf, wf))
    impls = {"native": native, "clipped": clipped,
             "im2col": im2col, "patches": patches}
    out = {}
    x, w = xf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16)
    for name, fn in impls.items():
        got = np.asarray(jax.jit(fn)(xf, wf))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-2)
        out[f"{name}_fwd_ms"] = round(time_fn(fn, x, w, iters=15) * 1e3, 3)

        def loss(a, k, _fn=fn):
            return jnp.sum(_fn(a, k).astype(jnp.float32) ** 2)

        gf = jax.grad(loss, argnums=(0, 1))
        out[f"{name}_fwdbwd_ms"] = round(
            time_fn(gf, x, w, iters=15) * 1e3, 3)
        print(name, out[f"{name}_fwd_ms"], out[f"{name}_fwdbwd_ms"],
              flush=True)

    print("ASPP_R12 " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
