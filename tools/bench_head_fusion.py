#!/usr/bin/env python
"""Probe: fused classifier+centerness ASPP branch convs at the eval shape.

In eval mode ``GlobalAndLocal`` applies TWO DeepLabHeads to the same f4
tensor (classifier for M_cls / mask_bb, centerness for M_ctr — reference
``/root/reference/GLfusion/models/ours.py:1802-1811``). Each head's ASPP
branch convs read the (V·B, 28, 28, 2048) map separately. Concatenating
the two heads' branch kernels along the output-channel axis turns two
2048→256 convs into one 2048→512 conv: identical dot products (exact in
real arithmetic — each output channel is an independent contraction),
half the passes over f4, wider MXU tiles.

This probe times the candidate pairs standalone BEFORE any model surgery:
  - b0: 1×1 conv 2048→256 ×2  vs  2048→512 ×1
  - b1: rate-12 clipped-tap 3×3 2048→256 ×2  vs  512 ×1
  - b2: rate-24 clipped-tap ×2 vs fused
  - (rate-36 is already the exact center 1×1 slice — covered by b0's shape)
plus the projection stage (two 1280→256 1×1 vs a block-diagonal 2560→512,
which DOUBLES FLOPs — expected loss, measured for the record).

Writes result/head_fusion_probe.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 96  # 3 views x 32 frames, the bench.py eval shape
H = W = 28
ITERS = 30


def main() -> int:
    from glfusion_tpu.models.aspp import DilatedConv3x3
    from glfusion_tpu.utils.profiling import time_fn

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(BATCH, H, W, 2048), jnp.bfloat16)
    out = {"batch": BATCH, "hw": H, "dtype": "bfloat16"}

    def conv1x1(x, k):
        return jax.lax.dot_general(
            x, k, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16)

    # ---- b0: 1x1 2048->256 twice vs 2048->512 once
    ka = jnp.asarray(rs.randn(2048, 256) * 0.02, jnp.bfloat16)
    kb = jnp.asarray(rs.randn(2048, 256) * 0.02, jnp.bfloat16)
    kf = jnp.concatenate([ka, kb], axis=1)

    t_sep = time_fn(lambda x: (conv1x1(x, ka), conv1x1(x, kb)), x,
                    iters=ITERS)
    t_fus = time_fn(lambda x: conv1x1(x, kf), x, iters=ITERS)
    # exactness: channel-concat of independent dot products
    ys = jnp.concatenate([conv1x1(x, ka), conv1x1(x, kb)], axis=-1)
    yf = conv1x1(x, kf)
    exact_b0 = bool(jnp.array_equal(ys, yf))
    out["b0_1x1"] = {"sep_ms": round(t_sep * 1e3, 3),
                     "fused_ms": round(t_fus * 1e3, 3),
                     "speedup": round(t_sep / t_fus, 3),
                     "bitwise_equal": exact_b0}

    # ---- b1/b2: clipped-tap dilated 3x3 via the model's own module
    for name, rate in (("b1_rate12", 12), ("b2_rate24", 24)):
        mod_a = DilatedConv3x3(256, rate, dtype=jnp.bfloat16)
        mod_f = DilatedConv3x3(512, rate, dtype=jnp.bfloat16)
        va = mod_a.init(jax.random.PRNGKey(0), x)
        vb = mod_a.init(jax.random.PRNGKey(1), x)
        kfused = jnp.concatenate([va["params"]["kernel"],
                                  vb["params"]["kernel"]], axis=-1)
        vf = {"params": {"kernel": kfused}}

        t_sep = time_fn(
            lambda x: (mod_a.apply(va, x), mod_a.apply(vb, x)), x,
            iters=ITERS)
        t_fus = time_fn(lambda x: mod_f.apply(vf, x), x, iters=ITERS)
        ys = jnp.concatenate([mod_a.apply(va, x), mod_a.apply(vb, x)],
                             axis=-1)
        yf = mod_f.apply(vf, x)
        out[name] = {"sep_ms": round(t_sep * 1e3, 3),
                     "fused_ms": round(t_fus * 1e3, 3),
                     "speedup": round(t_sep / t_fus, 3),
                     "max_abs_diff": float(jnp.max(jnp.abs(
                         ys.astype(jnp.float32) - yf.astype(jnp.float32))))}

    # ---- projection: two 1280->256 vs block-diagonal 2560->512 (2x FLOPs)
    xa = jnp.asarray(rs.rand(BATCH, H, W, 1280), jnp.bfloat16)
    xb = jnp.asarray(rs.rand(BATCH, H, W, 1280), jnp.bfloat16)
    pa = jnp.asarray(rs.randn(1280, 256) * 0.02, jnp.bfloat16)
    pb = jnp.asarray(rs.randn(1280, 256) * 0.02, jnp.bfloat16)
    pf = jnp.zeros((2560, 512), jnp.bfloat16)
    pf = pf.at[:1280, :256].set(pa).at[1280:, 256:].set(pb)
    xc = jnp.concatenate([xa, xb], axis=-1)
    t_sep = time_fn(lambda a, b: (conv1x1(a, pa), conv1x1(b, pb)), xa, xb,
                    iters=ITERS)
    t_fus = time_fn(lambda c: conv1x1(c, pf), xc, iters=ITERS)
    out["projection_blockdiag"] = {"sep_ms": round(t_sep * 1e3, 3),
                                   "fused_ms": round(t_fus * 1e3, 3),
                                   "speedup": round(t_sep / t_fus, 3)}

    res = Path(__file__).resolve().parent.parent / "result"
    res.mkdir(exist_ok=True)
    (res / "head_fusion_probe.json").write_text(json.dumps(out, indent=1))
    print("HEAD_FUSION " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
