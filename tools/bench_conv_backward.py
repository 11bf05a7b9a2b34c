#!/usr/bin/env python
"""Probe XLA:TPU's conv-backward layout transposes (BASELINE.md MFU floor).

xprof attributes ~72 ms of the 0.36 s train step to transpose fusions
inside convolution backward passes (BASELINE.md "Step decomposition").
Those transposes are XLA-internal layout assignments for the dW/dX conv
formulations. This tool measures, at the step's hot conv shapes, whether
any *alternative gradient formulation* expressible from JAX dodges them:

  A. xla_default   — jax.grad of conv_general_dilated (what the model runs)
  B. custom_dw_dot — custom_vjp: dW computed as one contraction
                     (im2col-free dot_general over the N·H·W axis:
                     dW[kh,kw,ci,co] = Σ_nhw x_shift[...,ci] · dy[...,co]
                     built from 9 shifted slices, no explicit transpose op)
  C. custom_dx_conv — dX as conv_general_dilated of dy with the spatially
                     flipped, ci/co-swapped kernel (the textbook transposed
                     conv), paired with XLA's own dW.

Per-shape fwd+bwd times via utils.profiling.time_fn (chained-scan, all-leaf
carry). A win ≥5 % at layer3/layer4 shapes would justify wiring an opt-in
custom_vjp into the backbone; a loss closes the last open attribution with
evidence. Results go to BASELINE.md.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


# Hot 3x3 conv shapes of the production step at the 120-frame cycle pass
# (28x28 dilated backbone; NHWC, HWIO). (label, N, H, W, Cin, Cout, dil)
SHAPES = [
    ("l2_3x3", 120, 28, 28, 128, 128, 1),
    ("l3_3x3_d2", 120, 28, 28, 256, 256, 2),
    ("l4_3x3_d4", 120, 28, 28, 512, 512, 4),
]

DN = jax.lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def conv(x, w, dil):
    pad = dil  # SAME for 3x3 at dilation d
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        rhs_dilation=(dil, dil), dimension_numbers=DN)


def make_custom_dw_dot(dil):
    """Variant B: dW as 9 shifted dot_generals, dX from XLA's conv vjp."""

    @jax.custom_vjp
    def f(x, w):
        return conv(x, w, dil)

    def fwd(x, w):
        return conv(x, w, dil), (x, w)

    def bwd(res, dy):
        x, w = res
        dy = dy.astype(x.dtype)
        # dX via the standard transposed conv (same as XLA's own choice)
        _, vjp = jax.vjp(lambda xx: conv(xx, w, dil), x)
        (dx,) = vjp(dy)
        # dW: for each (kh, kw) tap, a single dot over N·H·W.
        n, h, wd, ci = x.shape
        co = dy.shape[-1]
        pad = dil
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        taps = []
        for kh in range(3):
            for kw in range(3):
                xs = jax.lax.dynamic_slice(
                    xp, (0, kh * dil, kw * dil, 0), (n, h, wd, ci))
                # (NHW, Ci)^T · (NHW, Co) -> (Ci, Co): one MXU matmul,
                # no transpose op (dot_general contracts the leading axes)
                taps.append(jax.lax.dot_general(
                    xs.reshape(-1, ci), dy.reshape(-1, co),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        dw = jnp.stack(taps).reshape(3, 3, ci, co).astype(w.dtype)
        return dx.astype(x.dtype), dw

    f.defvjp(fwd, bwd)
    return f


def make_custom_dx_conv(dil):
    """Variant C: dX as an explicit flipped-kernel conv; dW from XLA."""

    @jax.custom_vjp
    def f(x, w):
        return conv(x, w, dil)

    def fwd(x, w):
        return conv(x, w, dil), (x, w)

    def bwd(res, dy):
        x, w = res
        dy = dy.astype(x.dtype)
        # dW via XLA's own vjp of the weight argument
        _, vjp = jax.vjp(lambda ww: conv(x, ww, dil), w)
        (dw,) = vjp(dy)
        # dX = conv(dy, flip(w) with ci/co swapped), same dilation/pad for
        # the stride-1 SAME 3x3 case
        wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
        dx = conv(dy, wt, dil)
        return dx.astype(x.dtype), dw.astype(w.dtype)

    f.defvjp(fwd, bwd)
    return f


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="result/conv_backward_probe.json")
    args = ap.parse_args(argv)

    from glfusion_tpu.utils.profiling import time_fn

    dtype = jnp.dtype(args.dtype)
    rows = []
    for label, n, h, wd, ci, co, dil in SHAPES:
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(n, h, wd, ci), dtype)
        w = jnp.asarray(rs.rand(3, 3, ci, co) * 0.01, dtype)

        variants = {
            "xla_default": lambda xx, ww, d=dil: conv(xx, ww, d),
            "custom_dw_dot": make_custom_dw_dot(dil),
            "custom_dx_conv": make_custom_dx_conv(dil),
        }
        row = {"shape": label}
        for name, fn in variants.items():
            def loss(xx, ww, fn=fn):
                return jnp.sum(fn(xx, ww).astype(jnp.float32) ** 2)

            g = jax.grad(loss, argnums=(0, 1))
            # numerical sanity once per variant (vs default), f32 tolerance
            if name != "xla_default":
                gd = jax.jit(jax.grad(
                    lambda xx, ww: jnp.sum(
                        conv(xx, ww, dil).astype(jnp.float32) ** 2),
                    argnums=(0, 1)))(x, w)
                gv = jax.jit(g)(x, w)
                for a, b in zip(jax.tree_util.tree_leaves(gd),
                                jax.tree_util.tree_leaves(gv)):
                    err = float(jnp.max(jnp.abs(
                        a.astype(jnp.float32) - b.astype(jnp.float32))))
                    scale = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
                    assert err <= 2e-2 * max(scale, 1.0), (
                        label, name, err, scale)
            row[name + "_ms"] = round(
                time_fn(g, x, w, iters=args.iters) * 1e3, 3)
        rows.append(row)
        print("CONVBWD " + json.dumps(row), flush=True)

    out = Path(args.out)
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(
        {"iters": args.iters, "dtype": args.dtype, "rows": rows}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
