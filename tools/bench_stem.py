#!/usr/bin/env python
"""Microbench: lowerings of the IEKD stem's 7x7 stride-1 1-channel conv.

MEASURED VERDICT: native wins (1.6 ms fwd / 4.3 fwd+bwd at 120 frames vs
1.8/5.2 patches-im2col, 3.9/8.2 stacked-im2col, 11.0/16.2 rowdot). The
stem MODULE's ~8 ms (1.7% of bf16 peak, tools/profile_stages.py) is NOT
the conv: it is bandwidth on the 110^2x64 activation through BN/ReLU/
maxpool, which no conv lowering fixes. Candidates, all exact:

  native   - lax.conv_general_dilated as nn.Conv emits today
  im2col   - stack the 49 shifted slices of the padded 1-ch image into a
             (..., 49) patch axis, one einsum against the (49, 64) kernel
  im2col_p - same but patches built by conv_general_dilated_patches
  rowdot   - 7 row-shifted (..., 7) einsums accumulated (less VMEM than 49)

Each is validated against the native result, then timed fwd and fwd+bwd at
the cycle shape (V*T = 120 frames, bf16).
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

B, H, K, P, COUT = 120, 112, 7, 2, 64
HO = H + 2 * P - K + 1  # 110


def native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((P, P), (P, P)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def im2col(x, w):
    xp = jnp.pad(x[..., 0], ((0, 0), (P, P), (P, P)))
    cols = jnp.stack(
        [xp[:, i:i + HO, j:j + HO] for i in range(K) for j in range(K)],
        axis=-1)  # (B, HO, HO, 49)
    return jnp.einsum("bhwk,ko->bhwo", cols, w.reshape(K * K, COUT),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def im2col_p(x, w):
    cols = jax.lax.conv_general_dilated_patches(
        x, (K, K), (1, 1), ((P, P), (P, P)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B, HO, HO, 49)
    return jnp.einsum("bhwk,ko->bhwo", cols, w.reshape(K * K, COUT),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def rowdot(x, w):
    xp = jnp.pad(x[..., 0], ((0, 0), (P, P), (P, P)))
    out = jnp.zeros((B, HO, HO, COUT), jnp.float32)
    for i in range(K):
        rows = jnp.stack([xp[:, i:i + HO, j:j + HO] for j in range(K)],
                         axis=-1)  # (B, HO, HO, 7)
        out = out + jnp.einsum("bhwk,ko->bhwo", rows, w[i].reshape(K, COUT),
                               preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def main() -> int:
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, H, H, 1), jnp.bfloat16)
    w = jnp.asarray(rs.randn(K, K, 1, COUT) * 0.05, jnp.bfloat16)

    ref = np.asarray(jax.jit(native)(x, w), np.float32)
    out = {}
    for name, fn in [("native", native), ("im2col", im2col),
                     ("im2col_p", im2col_p), ("rowdot", rowdot)]:
        got = np.asarray(jax.jit(fn)(x, w), np.float32)
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
        out[f"{name}_fwd_ms"] = round(time_fn(fn, x, w, iters=20) * 1e3, 3)

        def loss(a, k, _fn=fn):
            return jnp.sum(_fn(a, k).astype(jnp.float32) ** 2)

        gf = jax.grad(loss, argnums=(0, 1))
        out[f"{name}_fwdbwd_ms"] = round(
            time_fn(gf, x, w, iters=20) * 1e3, 3)
        print(name, out[f"{name}_fwd_ms"], out[f"{name}_fwdbwd_ms"],
              flush=True)

    print("STEM " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
